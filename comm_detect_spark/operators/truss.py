"""k-truss decomposition by iterative support peeling.

No reference twin (SURVEY §2); the k-truss (Cohen, NSA TR'08) is the
edge-analogue of the k-core — the maximal subgraph where every edge closes
at least k-2 triangles — and the standard "community-strength" filter on
web/social graphs (denser than k-core, cheaper than clique).

One peel round on the current edge set E_i:

    tris    = triangles_df(E_i)        (degree-ordered enumeration,
                                        arboricity-bounded wedge join —
                                        triangles.py's scale argument)
    support = each triangle charges its 3 edges; hash-agg count
    E_{i+1} = edges with support >= k-2 (edges in no triangle have no
              support row and drop via the inner join)

Rounds run under the lineage-truncation IterationDriver (plans/driver.py)
— each round's edge set is materialized and its plan cut, so N rounds cost
N triangle jobs, not one plan of depth N.

Fixed `rounds` keeps the operator oracle-replayable (the driver query's
DuckDB twin unrolls the same rounds); `rounds=None` peels to the true
fixpoint with the driver-loop convergence check (count unchanged), the
mode a production truss filter runs.

100 TB shape: the per-round cost IS the triangle join, which the
degree-ordered orientation keeps subquadratic at hubs; peeling strictly
shrinks E_i monotonically, so round cost decays; the support agg is
map-side combined on (a, b). No driver-side state beyond the convergence
counter."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.operators.triangles import _simple, triangles_df
from comm_detect_spark.plans.driver import IterationDriver


def edge_support(edges_ab: DataFrame) -> DataFrame:
    """(a, b, support): triangles per edge of a simple (a < b) edge list.
    Edges in no triangle are absent (support 0 is never materialized —
    at web scale most edges are support-0 and the truss filter drops
    them; an explicit 0 row would be the biggest table in the job)."""
    tris = triangles_df(
        edges_ab.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    charged = (
        tris.select(F.col("a"), F.col("b"))
        .unionAll(tris.select(F.col("a"), F.col("c").alias("b")))
        .unionAll(tris.select(F.col("b").alias("a"), F.col("c").alias("b")))
    )
    return charged.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("support")
    )


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 4,
    rounds: int | None = None,
) -> DataFrame:
    """(a, b, support) — the edge set surviving `rounds` peel iterations
    (or the fixpoint when rounds is None), with each surviving edge's
    support AT THE LAST COMPUTED ROUND (the fixpoint support for
    rounds=None, by definition of fixpoint)."""
    thresh = k - 2
    if thresh <= 0:
        raise ValueError("k must be >= 3 (k-2 triangles per edge)")
    drv = IterationDriver()
    cur = drv.start(_simple(edges).select(
        F.col("x").alias("a"), F.col("y").alias("b")
    ))
    prev_n = cur.count()
    i = 0
    while True:
        i += 1
        sup = edge_support(cur.select("a", "b"))
        nxt = (
            cur.select("a", "b")
            .join(sup, ["a", "b"])
            .where(F.col("support") >= thresh)
        )
        cur = drv.step(nxt, i)
        if rounds is not None:
            if i >= rounds:
                break
        else:
            n = cur.count()
            if n == prev_n:
                break
            prev_n = n
    return cur.select("a", "b", "support")
