"""Isolated interleaved timing of the small sf0.1 core-tier graph queries
(driver entry points, exactly as bench.py runs them)."""
import os, sys, time, statistics
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROF_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = os.environ.get(
    "PROF_QUERIES",
    "pagerank_iter1,lpa_round1,cc_round1,cc_full,cc_warm,"
    "pagerank_delta_trace,graph_volumes,pagerank_warm2,corpus_dedup",
).split(",")


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


from comm_detect_spark.session import get_spark

spark = get_spark(app_name="small-query-bench", cores=CPUS,
                  shuffle_partitions=CPUS)
import __spark_entry__ as entry_mod

queries = entry_mod.queries()
runs = {n: [] for n in NAMES}
anchors = []
for rep in range(REPS):
    anchors.append(round(hw_anchor(), 2))
    for name in NAMES:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).count()
        runs[name].append(round(time.perf_counter() - t0, 3))
    print(f"rep{rep} anchor={anchors[-1]} " +
          " ".join(f"{n}={runs[n][-1]}" for n in NAMES), flush=True)
print("anchors:", anchors, "median", statistics.median(anchors))
for name in NAMES:
    ts = runs[name]
    print(f"{name}: min {min(ts):.3f}  med {statistics.median(ts):.3f}  {ts}")
spark.stop()
