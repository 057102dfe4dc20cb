"""Ego / k-hop subgraph extraction.

No reference twin (SURVEY §2); the k-hop neighborhood of a seed set is
the debugging and sampling primitive of every large-graph workflow —
"give me the 2-hop web around these pages" to inspect a community, test
an algorithm change locally, or build a labeled subcorpus — and at
10^12 edges it must run as frontier joins, never as a collect.

Semantics (stated): R = vertices reachable from the seeds within k
DIRECTED out-hops (the seed set itself is hop 0); the result is the
INDUCED edge set {(src, dst, weight) : src in R and dst in R}. Pass the
symmetrized edge table for undirected neighborhoods.

Plan shape: k frontier rounds (one join + one anti-join each — the
unweighted special case of sssp's relaxation, frontier-sized not
graph-sized), then ONE semi-join per endpoint to induce the edges. The
reach set is a vertex table; nothing edge-sized ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def khop_subgraph(
    spark: SparkSession,
    edges: DataFrame,
    seeds: list[int],
    k: int = 2,
) -> DataFrame:
    """(src, dst, weight): the edge set induced on the k-out-hop reach of
    ``seeds``. Deterministic; parallel edges pass through untouched."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").cast("long").alias("weight"),
    )
    hop_edges = e.select("src", "dst").distinct().persist()
    seed_verts = spark.createDataFrame(
        [(int(s),) for s in sorted(set(seeds))], "vid long"
    ).persist()
    reach = seed_verts
    frontier = reach
    for _ in range(k):
        nxt = (
            hop_edges.join(
                frontier.withColumnRenamed("vid", "src"), "src"
            )
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(reach, "vid", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reach = reach.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    out = (
        e.join(reach.withColumnRenamed("vid", "src"), "src", "semi")
        .join(reach.withColumnRenamed("vid", "dst"), "dst", "semi")
        .select("src", "dst", "weight")
    )
    hop_edges.unpersist()
    # safe even when reach still aliases the seed frame (k=0 or an empty
    # first frontier): the seed list is a driver-local collection, so an
    # uncached re-read costs nothing
    seed_verts.unpersist()
    return out
