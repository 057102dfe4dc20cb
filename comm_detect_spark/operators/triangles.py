"""Triangle counting on the simple undirected graph (SURVEY Table C).

Standard oriented two-path + closure join:

    simple  = dedup(min(u,v), max(u,v)), self-loops dropped   -- one shuffle
    wedges  = e1(a,b) ⋈ e2(b,c) with a<b<c                    -- the big join
    tris    = wedges ⋈ simple on (a,c)                        -- closure check

Orienting by degree (low-degree endpoint first) would bound wedge counts by
arboricity; we orient by id (simpler, deterministic) and rely on AQE skew
splitting — at true web scale switch `_orient` to the degree ordering, the
rest of the plan is unchanged. Each triangle (a<b<c) appears exactly once;
per-vertex counts explode the 3 corners and hash-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented_simple(edges: DataFrame) -> DataFrame:
    """Distinct (a, b) with a < b, self-loops removed, weights ignored."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def triangles_df(edges: DataFrame) -> DataFrame:
    """All triangles (a < b < c), one row each."""
    e = _oriented_simple(edges)
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = e.select(F.col("a"), F.col("b").alias("c"))
    return wedges.join(closing, ["a", "c"]).select("a", "b", "c")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(vid, triangles) per vertex; global total = sum/3."""
    tris = triangles_df(edges)
    corners = tris.select(F.explode(F.array("a", "b", "c")).alias("vid"))
    return corners.groupBy("vid").agg(F.count(F.lit(1)).alias("triangles"))


def triangle_total(edges: DataFrame) -> int:
    return triangles_df(edges).count()
