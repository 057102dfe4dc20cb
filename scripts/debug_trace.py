"""Per-phase timing of _q_pagerank_trace internals at sf0.1."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
import __spark_entry__ as entry_mod

spark = get_spark(app_name="debug-trace", cores=CPUS, shuffle_partitions=CPUS)

edges = entry_mod._g_directed(spark, SF_DIR)
vertices = (
    edges.select(F.col("src").alias("vid"))
    .unionAll(edges.select(F.col("dst").alias("vid")))
    .distinct()
)
damping = 0.85
iterations = 4

t = time.perf_counter()
verts = vertices.select("vid").distinct().persist()
n = verts.count()
print(f"verts n={n} {time.perf_counter()-t:.3f}", flush=True)
t = time.perf_counter()
wout = edges.groupBy("src").agg(F.sum("weight").alias("wout"))
edges_prep = (
    edges.join(wout, "src")
    .select("src", "dst", (F.col("weight") / F.col("wout")).alias("frac"))
    .persist()
)
m = edges_prep.count()
print(f"edges_prep m={m} {time.perf_counter()-t:.3f}", flush=True)
t = time.perf_counter()
dangling = verts.join(
    edges_prep.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
).persist()
nd = dangling.count()
print(f"dangling nd={nd} {time.perf_counter()-t:.3f}", flush=True)
t = time.perf_counter()
ranks = (
    verts.join(dangling.withColumn("_d", F.lit(True)), "vid", "left")
    .select("vid", F.coalesce("_d", F.lit(False)).alias("dang"),
            F.lit(1.0 / n).alias("rank"))
    .persist()
)
ranks.count()
print(f"ranks init {time.perf_counter()-t:.3f}", flush=True)
for it in range(1, iterations + 1):
    t0 = time.perf_counter()
    dm_df = ranks.agg(
        F.coalesce(F.sum(F.when(F.col("dang"), F.col("rank"))), F.lit(0.0)).alias("dm")
    )
    summed = (
        edges_prep.join(
            ranks.select("vid", "rank").withColumnRenamed("vid", "src"), "src"
        )
        .select("dst", (F.col("rank") * F.col("frac")).alias("contrib"))
        .groupBy("dst")
        .agg(F.sum("contrib").alias("s"))
    )
    new_ranks = (
        ranks.select("vid", "dang")
        .join(summed.withColumnRenamed("dst", "vid"), "vid", "left")
        .crossJoin(F.broadcast(dm_df))
        .select(
            "vid", "dang",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
            ).alias("rank"),
        )
        .persist()
    )
    t1 = time.perf_counter()
    l1 = (
        new_ranks.select("vid", "rank")
        .join(ranks.select("vid", F.col("rank").alias("prev")), "vid")
        .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("l1"))
        .collect()[0]["l1"]
    )
    t2 = time.perf_counter()
    ranks.unpersist()
    ranks = new_ranks
    print(f"iter {it} build {t1-t0:.3f} l1job {t2-t1:.3f} (l1={l1:.6f})", flush=True)
spark.stop()
