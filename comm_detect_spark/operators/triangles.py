"""Triangle counting on the simple undirected graph (SURVEY Table C).

Degree-ordered orientation + two-path + closure join:

    simple   = dedup(min(u,v), max(u,v)), self-loops dropped   -- one shuffle
    oriented = each edge directed from the LOWER-(degree, id) endpoint
               to the higher (total order; id breaks degree ties
               deterministically)
    wedges   = out-edges paired at their pivot, ordered             -- the big join
    tris     = wedges ⋈ oriented on the closing pair               -- closure check

Orienting by degree bounds every vertex's out-degree by O(sqrt(m)) on any
graph (arboricity bound), so the wedge join stays subquadratic even at hub
vertices of a power-law web graph — orienting by id instead lets a hub with
degree 10^7 generate 10^14 wedges. Each triangle is enumerated exactly once
(at its lowest-order corner, with its two other corners ordered); the
output triple is then re-sorted by vertex id so results are identical to
the id-oriented formulation (oracle + DuckDB parity unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _simple(edges: DataFrame) -> DataFrame:
    """Distinct undirected (x < y), self-loops removed, weights ignored."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
        )
        .distinct()
    )


def _oriented(edges: DataFrame) -> DataFrame:
    """(a, da, b, db): each simple edge directed low-(deg, id) -> high."""
    simple = _simple(edges)
    deg = (
        simple.select(F.explode(F.array("x", "y")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withd = simple.join(
        deg.select(F.col("v").alias("x"), F.col("deg").alias("dx")), "x"
    ).join(deg.select(F.col("v").alias("y"), F.col("deg").alias("dy")), "y")
    low_first = F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    return withd.select(
        F.when(low_first, F.col("x")).otherwise(F.col("y")).alias("a"),
        F.when(low_first, F.col("dx")).otherwise(F.col("dy")).alias("da"),
        F.when(low_first, F.col("y")).otherwise(F.col("x")).alias("b"),
        F.when(low_first, F.col("dy")).otherwise(F.col("dx")).alias("db"),
    )


def triangles_df(edges: DataFrame) -> DataFrame:
    """All triangles, one row each, columns (a < b < c) by vertex id."""
    e = _oriented(edges)
    e1 = e.select("a", F.col("b").alias("v"), F.col("db").alias("dv"))
    e2 = e.select("a", F.col("b").alias("w"), F.col("db").alias("dw"))
    wedges = e1.join(e2, "a").where(
        F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w"))
    )
    # the closing edge (v, w) is oriented v -> w because ord(v) < ord(w)
    closing = e.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tris = wedges.join(closing, ["v", "w"]).select(
        F.col("a").alias("u"), "v", "w"
    )
    lo = F.least("u", "v", "w")
    hi = F.greatest("u", "v", "w")
    # middle corner picked conditionally, NOT as u+v+w-lo-hi: for raw
    # --edges inputs (vids not dense-minted) three large int64 ids can
    # overflow the intermediate sum; the corners are distinct so exactly
    # one of them is neither least nor greatest
    mid = (
        F.when((F.col("u") != lo) & (F.col("u") != hi), F.col("u"))
        .when((F.col("v") != lo) & (F.col("v") != hi), F.col("v"))
        .otherwise(F.col("w"))
    )
    return tris.select(lo.alias("a"), mid.alias("b"), hi.alias("c"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(vid, triangles) per vertex; global total = sum/3."""
    tris = triangles_df(edges)
    corners = tris.select(F.explode(F.array("a", "b", "c")).alias("vid"))
    return corners.groupBy("vid").agg(F.count(F.lit(1)).alias("triangles"))


def triangle_total(edges: DataFrame) -> int:
    return triangles_df(edges).count()
