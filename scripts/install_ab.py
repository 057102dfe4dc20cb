"""A/B the IterationDriver truncation strategies at scale-20 pagerank:
  eager  - r6 shape: persist+count, then eager localCheckpoint re-reading
           the cache (2 jobs per truncation iteration)
  lazy   - r7 shape: persist+count, lazy localCheckpoint (next action
           materializes; 1 job)
  none   - no truncation at all (checkpoint_every > iterations)
10 iterations, checkpoint_every=3, interleaved reps with anchors."""
import os, sys, time, statistics
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("PROF_SCALE", "20"))
EF = int(os.environ.get("PROF_EF", "12"))
ITERS = 10
REPS = int(os.environ.get("PROF_REPS", "3"))
if SCALE >= 19:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.graph.core import vertex_range
from comm_detect_spark.sources.rmat import rmat_edges_distributed


def hw_anchor(threads=4, units_per_thread=2):
    import numpy as np

    def burn(_):
        x = np.random.default_rng(0).random(300_000)
        for _ in range(40):
            np.sort(x)

    n_units = threads * units_per_thread
    t0 = time.perf_counter()
    with ThreadPoolExecutor(threads) as ex:
        list(ex.map(burn, range(n_units)))
    return n_units / (time.perf_counter() - t0)


spark = get_spark(app_name="install-ab", cores=CPUS, shuffle_partitions=CPUS)
n = 1 << SCALE
directed = rmat_edges_distributed(spark, SCALE, EF, num_partitions=CPUS).persist()
m = directed.count()
print(f"graph n={n} m={m}", flush=True)
p = CPUS
damping = 0.85


def run(mode: str):
    e2 = directed.select("src", "dst", "weight").repartition(p, "src")
    wout = e2.groupBy("src").agg(F.sum("weight").alias("wout"))
    edges_prep = e2.join(wout.hint("shuffle_hash"), "src").select(
        "src", "dst", (F.col("weight") / F.col("wout")).alias("frac")
    ).persist()
    edges_prep.count()
    verts = vertex_range(spark, n)
    dangling = verts.join(
        edges_prep.select(F.col("src").alias("vid")).distinct(), "vid",
        "left_anti",
    ).persist()
    dangling.count()
    state = (
        verts.join(dangling.withColumn("_d", F.lit(True)), "vid", "left")
        .select("vid", F.coalesce("_d", F.lit(False)).alias("dang"),
                F.lit(1.0 / n).alias("rank"))
        .repartition(p, "vid").persist()
    )
    state.count()
    lazy_feeder = None
    for it in range(1, ITERS + 1):
        dm_df = state.agg(F.coalesce(
            F.sum(F.when(F.col("dang"), F.col("rank"))), F.lit(0.0)).alias("dm"))
        rside = (state.select("vid", "rank").withColumnRenamed("vid", "src")
                 .hint("shuffle_hash"))
        contribs = edges_prep.join(rside, "src").select(
            "dst", (F.col("rank") * F.col("frac")).alias("contrib"))
        summed = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
        new_ranks = (
            state.select("vid", "dang")
            .join(summed.withColumnRenamed("dst", "vid").hint("shuffle_hash"),
                  "vid", "left")
            .crossJoin(F.broadcast(dm_df))
            .select("vid", "dang",
                    (F.lit((1.0 - damping) / n) + F.lit(damping)
                     * (F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n)))).alias("rank"))
        )
        prepared = new_ranks.persist()
        prepared.count()
        truncate = it % 3 == 0
        old = state
        if truncate and mode == "eager":
            chk = prepared.localCheckpoint(eager=True)
            prepared.unpersist()
            state = chk
        elif truncate and mode == "lazy":
            state = prepared.localCheckpoint(eager=False)
            if lazy_feeder is not None:
                lazy_feeder.unpersist()
            lazy_feeder = prepared
        else:
            state = prepared
        if old is not None:
            old.unpersist()
    r = state.agg(F.sum("rank")).collect()[0][0]
    for df in (edges_prep, dangling, state):
        df.unpersist()
    if lazy_feeder is not None:
        lazy_feeder.unpersist()
    return r


modes = ["eager", "lazy"]
runs = {k: [] for k in modes}
anchors = []
for rep in range(REPS):
    anchors.append(round(hw_anchor(), 2))
    for mode in modes:
        t0 = time.perf_counter()
        val = run(mode)
        dt = round(time.perf_counter() - t0, 3)
        runs[mode].append(dt)
        print(f"rep{rep} anchor={anchors[-1]} {mode}: {dt} (sum={val})",
              flush=True)
for k, ts in runs.items():
    print(f"{k}: min {min(ts):.3f} med {statistics.median(ts):.3f} {ts}")
spark.stop()
