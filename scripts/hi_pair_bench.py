"""Isolated timing of the bench's headline pair (pagerank/lpa on the
scale-20 hi graph) through the REAL library entry points, interleaved with
the hw anchor — for before/after attribution of r7 operator changes."""
import os, sys, time, statistics
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("PROF_SCALE", "20"))
EF = int(os.environ.get("PROF_EF", "12"))
REPS = int(os.environ.get("PROF_REPS", "3"))
if SCALE >= 19:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.plans.driver import IterationDriver
from comm_detect_spark.operators.pagerank import pagerank
from comm_detect_spark.operators.lpa import lpa_sync
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


spark = get_spark(app_name="hi-pair-bench", cores=CPUS, shuffle_partitions=CPUS)
n = 1 << SCALE
directed = rmat_edges_distributed(spark, SCALE, EF, num_partitions=CPUS).persist()
m = directed.count()
sym = (
    directed.select("src", "dst", "weight")
    .unionAll(directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    .where(F.col("src") != F.col("dst"))
    .groupBy("src", "dst")
    .agg(F.sum("weight").alias("weight"))
    .persist()
)
msym = sym.count()
print(f"graph: scale={SCALE} n={n} m={m} msym={msym}", flush=True)

runs = {"pagerank_rmat_hi": [], "lpa_sync_rmat_hi": []}
anchors = []
for rep in range(REPS):
    anchors.append(round(hw_anchor(), 2))
    t0 = time.perf_counter()
    pagerank(
        spark, directed, n, iterations=10,
        driver=IterationDriver(checkpoint_every=3),
    ).count()
    runs["pagerank_rmat_hi"].append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    lpa_sync(
        spark, sym, n, eps=-1.0, max_iter=4,
        driver=IterationDriver(checkpoint_every=3),
    ).count()
    runs["lpa_sync_rmat_hi"].append(round(time.perf_counter() - t0, 3))
    print(f"rep{rep} anchor={anchors[-1]} pr={runs['pagerank_rmat_hi'][-1]} "
          f"lpa={runs['lpa_sync_rmat_hi'][-1]}", flush=True)
print("anchors:", anchors, "median", statistics.median(anchors))
for k, ts in runs.items():
    print(f"{k}: min {min(ts):.3f}  med {statistics.median(ts):.3f}  runs {ts}")
spark.stop()
