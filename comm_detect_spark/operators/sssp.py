"""Multi-source shortest paths — distributed Bellman-Ford rounds.

No reference twin (SURVEY §2 is community detection); SSSP is the other
classic Pregel-style frontier algorithm of a link-graph engine — distance
from a seed set (crawl frontier depth, landmark distance features for
link-graph embeddings, hop-limited reachability). Unweighted BFS is the
weight=1 special case.

One relaxation round = the min-plus product of the sparse distance vector
with the edge table:

  relax   dist JOIN edges ON vid = src  ->  (dst, dist + w)
  fold    groupBy(dst).min  UNION  current dist  ->  groupBy(vid).min

Same co-partitioning contract as connected_components (components.py:25):
edges are cached pre-partitioned hash(src, P) and the iterated state lives
on hash(vid, P), so the per-round join is exchange-free and only the dst
min-aggregation (map-side combined) shuffles edge-sized rows. The distance
table is SPARSE — unreached vertices don't exist yet — so early rounds on
a 100 TB graph move only the frontier's neighborhood, not the full vertex
set; negative weights are rejected (min-plus with negative cycles never
converges).

Fixed-`rounds` mode keeps the plan static for the oracle (the DuckDB twin
unrolls the identical min-plus recurrence); fixpoint mode runs under the
IterationDriver (lineage truncation + checkpoint/resume, plans/driver.py)
until no distance improves — at most diameter rounds, the Bellman-Ford
bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.plans.driver import IterationDriver


def sssp(
    spark: SparkSession,
    edges: DataFrame,
    sources: list[int],
    rounds: int | None = None,
    max_rounds: int = 50,
    driver: IterationDriver | None = None,
    num_partitions: int | None = None,
    resume: bool = False,
) -> DataFrame:
    """(vid BIGINT, dist BIGINT): length of the shortest weighted path
    from the nearest of ``sources`` after ``rounds`` relaxations (or to
    fixpoint when ``rounds`` is None). Only reached vertices appear.
    Parallel edges collapse to their minimum weight first (min-plus
    semantics). Raises on negative weights, and raises RuntimeError if
    fixpoint mode exhausts ``max_rounds`` before converging. With a checkpoint-backed
    driver and ``resume=True``, fixpoint mode continues from the latest
    snapshot (an already-converged run — last logged changed == 0 —
    returns it untouched; same contract as connected_components)."""
    drv = driver or IterationDriver()
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col("weight").cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(p, "src")
        .persist()
    )
    neg = e.where(F.col("w") < 0).count()
    if neg:
        e.unpersist()
        raise ValueError(f"sssp: {neg} negative-weight edges (min-plus "
                         "relaxation requires w >= 0)")

    resumed = drv.try_resume(spark) if resume else None
    if resumed is not None:
        dist, start_it, hist = resumed
        if (
            rounds is None
            and int(hist.get(start_it, {}).get("changed", 1)) == 0
        ):
            e.unpersist()
            return drv.finish(start_it)
    else:
        dist = drv.start(
            spark.createDataFrame(
                [(int(s), 0) for s in sorted(set(sources))],
                "vid long, dist long",
            ).repartition(p, "vid")
        )
        start_it = 0
    n_rounds = rounds if rounds is not None else max_rounds
    it = start_it
    improved = 0
    for it in range(start_it + 1, n_rounds + 1):
        relaxed = (
            e.join(dist.withColumnRenamed("vid", "src"), "src")
            .select(
                F.col("dst").alias("vid"),
                (F.col("dist") + F.col("w")).alias("cand"),
            )
            .groupBy("vid")
            .agg(F.min("cand").alias("cand"))
        )
        new_dist = (
            dist.join(relaxed, "vid", "full")
            .select(
                "vid",
                F.least(
                    F.coalesce("dist", F.col("cand")),
                    F.coalesce("cand", F.col("dist")),
                ).alias("dist"),
            )
        )
        if rounds is None:
            new_dist = drv.prepare(new_dist, it)
            improved = (
                new_dist.withColumnRenamed("dist", "d2")
                .join(dist, "vid", "left")
                .where(
                    F.col("dist").isNull() | (F.col("d2") < F.col("dist"))
                )
                .count()
            )
            dist = drv.install(new_dist, it, changed=improved)
            if improved == 0:
                break
        else:
            dist = drv.step(new_dist, it, changed=-1)
    if rounds is None and improved > 0:
        # fail-loud contract (same as scc.py): "to fixpoint" must never
        # return non-converged distances that look like a correct result —
        # a long weighted chain can need more than max_rounds relaxations
        e.unpersist()
        raise RuntimeError(
            f"sssp: not converged after max_rounds={max_rounds} "
            f"({improved} distances still improving); raise max_rounds"
        )
    out = drv.finish(it)
    e.unpersist()
    return out
