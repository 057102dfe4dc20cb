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

def landmark_distances(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: list[int],
    rounds: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(s BIGINT, vid BIGINT, dist BIGINT): per-LANDMARK shortest weighted
    distances after ``rounds`` min-plus relaxations — sssp keeps only the
    min over sources; this keeps each source's distance separately, the
    landmark-embedding shape (k distance features per vertex for link
    prediction / geo-partitioning; Das Sarma et al., "A Sketch-Based
    Distance Oracle", WSDM'10 is the classic recipe).

    Same plan as sssp with the state keyed (s, vid): one frontier join +
    one map-side-combined min per round, state at most k x n rows (k =
    len(landmarks), an operator constant). Hash-partitioned on vid so
    the k-fold state of a vertex co-locates with its edges; lineage cut
    every 3 rounds. Raises on negative weights (min-plus)."""
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
        raise ValueError(
            f"landmark_distances: {neg} negative-weight edges"
        )
    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sorted(set(landmarks))],
        "s long, vid long, dist long",
    ).repartition(p, "vid")
    for it in range(1, rounds + 1):
        relaxed = (
            e.join(dist.withColumnRenamed("vid", "src"), "src")
            .select(
                "s",
                F.col("dst").alias("vid"),
                (F.col("dist") + F.col("w")).alias("cand"),
            )
            .groupBy("s", "vid")
            .agg(F.min("cand").alias("cand"))
        )
        dist = (
            dist.join(relaxed, ["s", "vid"], "full")
            .select(
                "s",
                "vid",
                F.least(
                    F.coalesce("dist", F.col("cand")),
                    F.coalesce("cand", F.col("dist")),
                ).alias("dist"),
            )
        )
        if it % 3 == 0 and it < rounds:
            dist = dist.localCheckpoint(eager=True)
    out = dist.localCheckpoint(eager=True)
    e.unpersist()
    return out


def landmark_closeness(dists: DataFrame) -> DataFrame:
    """(vid, reached, closeness): per-vertex landmark-closeness summary
    from a landmark_distances table — reached = how many landmarks see
    the vertex, closeness = reached / sum(dist) (0 when every seen
    distance is 0, i.e. the landmark itself with no other landmark in
    range). Rounded to 6 (cross-engine convention)."""
    return dists.groupBy("vid").agg(
        F.count(F.lit(1)).cast("long").alias("reached"),
        F.round(
            F.coalesce(
                F.try_divide(F.count(F.lit(1)), F.sum("dist")), F.lit(0.0)
            ),
            6,
        ).alias("closeness"),
    )
