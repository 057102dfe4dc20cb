"""k-core decomposition: iterative peeling of vertices with degree < k on
the simple undirected graph.

Web-scale shape: each round is ONE degree aggregation (hash agg over the
surviving adjacency entries) plus an anti-join removing the peeled
vertices' edges. The peel set shrinks geometrically on real graphs and is
usually tiny relative to the edge table, so the anti-join's build side is
small — AQE turns it into a broadcast join at runtime without any manual
hint. Lineage is truncated with localCheckpoint every few rounds (the same
iterative-plan hygiene as pagerank.py; unbounded lineage is the classic
iterative-Spark OOM).

Semantics (matched by the numpy oracle in oracle/algorithms.py::k_core):
degree counts DISTINCT neighbors on the de-duplicated simple graph
(self-loops dropped, weights ignored — standard k-core is structural).
Output is (vid, in_core) over ALL vertices of the simple graph, so the
result is a total classification, not just the survivor list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(vid, in_core): vertices of the maximal subgraph in which every
    vertex has degree >= k. Deterministic (pure function of the graph).
    Raises RuntimeError if peeling has not reached fixpoint within
    ``max_iter`` rounds (e.g. a long path graph peels one layer per
    round) — never returns in_core=True for an undecided vertex."""
    if k < 1:
        raise ValueError(f"k_core needs k >= 1, got {k}")
    simple = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
        )
        .distinct()
    )
    all_verts = (
        simple.select(F.col("x").alias("vid"))
        .unionAll(simple.select(F.col("y").alias("vid")))
        .distinct()
        .persist()
    )
    all_verts.count()
    # both directions so degree is one groupBy(src)
    cur = (
        simple.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .unionAll(simple.select(F.col("y").alias("src"), F.col("x").alias("dst")))
        .persist()
    )
    cur.count()
    for it in range(max_iter):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        peel = deg.where(F.col("deg") < k).select("src").persist()
        n_peel = peel.count()
        if n_peel == 0:
            peel.unpersist()
            break
        nxt = (
            cur.join(peel, "src", "left_anti")
            .join(peel.select(F.col("src").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
        )
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        cur.unpersist()
        peel.unpersist()
        cur = nxt
    else:
        # loop exhausted max_iter without the n_peel == 0 break: verify the
        # survivor set actually reached fixpoint; if any vertex is still
        # sub-k, the result would silently misclassify it as in-core
        # (fail-loud contract, same as scc.py / sssp.py)
        n_sub = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") < k)
            .count()
        )
        if n_sub:
            raise RuntimeError(
                f"k_core: not converged after max_iter={max_iter} "
                f"({n_sub} vertices still below degree {k}); raise max_iter"
            )
    survivors = cur.select(F.col("src").alias("vid")).distinct()
    out = all_verts.join(
        survivors.withColumn("_in", F.lit(True)), "vid", "left"
    ).select("vid", F.coalesce(F.col("_in"), F.lit(False)).alias("in_core"))
    return out


def local_clustering(edges: DataFrame) -> DataFrame:
    """(vid, coeff): local clustering coefficient on the simple undirected
    graph — 2 * triangles(v) / (deg(v) * (deg(v) - 1)), 0.0 when deg < 2.
    Rounded to 6 decimals (cross-engine hash stability).

    Reuses the degree-ordered triangle enumeration (triangles.py), so hub
    vertices stay subquadratic; the degree join is vertex-sized.
    """
    from comm_detect_spark.operators.triangles import _simple, triangle_counts

    simple = _simple(edges)
    deg = (
        simple.select(F.explode(F.array("x", "y")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(edges)
    return deg.join(tri, "vid", "left").select(
        "vid",
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("coeff"),
    )
