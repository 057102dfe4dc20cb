"""HITS (hubs & authorities) over a directed edge table.

Kleinberg's alternating iteration with L2 normalization each half-step:

    auth'(v) = sum_{u->v} hub(u)        then auth /= ||auth||_2
    hub'(u)  = sum_{u->v} auth'(v)      then hub  /= ||hub||_2

Plan shape per iteration: the edge table is cached TWICE, hash-partitioned
on src and on dst (each join side pre-partitioned once, reused every
iteration — same co-partitioning contract as pagerank.py), so each
half-step is one join + one edge-sized groupBy exchange; the L2 norm is a
one-row aggregate broadcast back (no driver collect inside the loop).
Weights multiply contributions (weighted HITS); unweighted graphs pass
weight=1 rows. Matches oracle.hits to 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.graph.core import vertex_range
from comm_detect_spark.plans.driver import IterationDriver


def hits(
    spark: SparkSession,
    edges: DataFrame,
    n: int | None = None,
    iterations: int = 10,
    driver: IterationDriver | None = None,
    vertices: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (vid BIGINT, hub DOUBLE, auth DOUBLE), L2-normalized."""
    drv = driver or IterationDriver()
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if vertices is not None:
        verts = vertices.select("vid").distinct().repartition(p, "vid").persist()
        n = verts.count()
    else:
        assert n is not None
        verts = vertex_range(spark, n).repartition(p, "vid").persist()
        verts.count()
    e_src = edges.select("src", "dst", "weight").repartition(p, "src").persist()
    e_src.count()
    e_dst = edges.select("src", "dst", "weight").repartition(p, "dst").persist()
    e_dst.count()

    state = drv.start(
        verts.select("vid", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    )
    it = 0
    for it in range(1, iterations + 1):
        # auth half-step: gather hub along edges into dst
        a_raw = (
            e_src.join(
                state.select(F.col("vid").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("hub") * F.col("weight")).alias("a"))
        )
        a_full = verts.join(
            a_raw.withColumnRenamed("dst", "vid"), "vid", "left"
        ).select("vid", F.coalesce(F.col("a"), F.lit(0.0)).alias("a"))
        a_norm = a_full.agg(
            F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("na")
        )
        a_df = (
            a_full.crossJoin(F.broadcast(a_norm))
            .select(
                "vid",
                F.when(F.col("na") > 0, F.col("a") / F.col("na"))
                .otherwise(F.lit(0.0))
                .alias("auth"),
            )
            .persist()
        )
        # hub half-step: gather the NEW auth along edges back into src
        h_raw = (
            e_dst.join(
                a_df.select(F.col("vid").alias("dst"), "auth"), "dst"
            )
            .groupBy("src")
            .agg(F.sum(F.col("auth") * F.col("weight")).alias("h"))
        )
        h_full = verts.join(
            h_raw.withColumnRenamed("src", "vid"), "vid", "left"
        ).select("vid", F.coalesce(F.col("h"), F.lit(0.0)).alias("h"))
        h_norm = h_full.agg(
            F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("nh")
        )
        new_state = (
            h_full.crossJoin(F.broadcast(h_norm))
            .select(
                "vid",
                F.when(F.col("nh") > 0, F.col("h") / F.col("nh"))
                .otherwise(F.lit(0.0))
                .alias("hub"),
            )
            .join(a_df, "vid")
            .select("vid", "hub", "auth")
        )
        state = drv.step(new_state, it)
        a_df.unpersist()
    out = drv.finish(it)
    e_src.unpersist()
    e_dst.unpersist()
    verts.unpersist()
    return out
