"""Isolate lpa_round1 / pagerank_iter1 sensitivity to the adaptive
partition count at sf0.1 (p=1 adaptive vs p=32 conf)."""
import os, sys, time, statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROF_REPS", "3"))

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.operators.lpa import lpa_sync
from comm_detect_spark.operators.pagerank import pagerank
import __spark_entry__ as entry_mod

spark = get_spark(app_name="lpa-p-test", cores=CPUS, shuffle_partitions=CPUS)

variants = {}
for p in (None, 4, 32):
    def lpa_v(p=p):
        sym = entry_mod._g_sym(spark, SF_DIR)
        verts = entry_mod._g_verts(spark, SF_DIR)
        return lpa_sync(
            spark, sym, vertices=verts, max_iter=1, num_partitions=p
        ).count()
    def pr_v(p=p):
        edges = entry_mod._g_directed(spark, SF_DIR)
        verts = (
            edges.select(F.col("src").alias("vid"))
            .unionAll(edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
        return pagerank(
            spark, edges, vertices=verts, iterations=1, num_partitions=p
        ).count()
    variants[f"lpa_p{p}"] = lpa_v
    variants[f"pr_p{p}"] = pr_v

runs = {k: [] for k in variants}
for rep in range(REPS):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        fn()
        runs[name].append(round(time.perf_counter() - t0, 3))
    print(f"rep{rep} " + " ".join(f"{k}={runs[k][-1]}" for k in runs), flush=True)
for k, ts in runs.items():
    print(f"{k}: min {min(ts):.3f} med {statistics.median(ts):.3f} {ts}")
spark.stop()
