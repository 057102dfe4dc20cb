"""Per-iteration phase profiler for the headline pagerank/lpa pair (guide §1).

Reproduces the exact pagerank() sql-mode loop on the scale-20 hi graph and
times each phase separately per iteration:
  build  - py4j/DataFrame plan construction (driver-side, serial)
  count  - the cache-fill action (the real distributed work)
  ckpt   - the localCheckpoint job on truncation iterations
  unper  - unpersist of the previous state
Prints a per-iteration table + totals, so the fixed driver cost named in
PERFORMANCE.md (~1.4 s/iter) gets attributed to a phase.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.graph.core import out_weights, vertex_range

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("PROF_SCALE", "20"))
EF = int(os.environ.get("PROF_EF", "12"))
ITERS = int(os.environ.get("PROF_ITERS", "10"))
if SCALE >= 19:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

spark = get_spark(app_name="profile-iter", cores=CPUS, shuffle_partitions=CPUS)
sc = spark.sparkContext

from comm_detect_spark.sources.rmat import rmat_edges_distributed

n = 1 << SCALE
directed = rmat_edges_distributed(spark, SCALE, EF, num_partitions=CPUS).persist()
m = directed.count()
print(f"graph: scale={SCALE} ef={EF} n={n} m={m}", flush=True)

p = CPUS
verts = vertex_range(spark, n).repartition(p, "vid").persist()
wout = out_weights(directed)
edges_prep = (
    directed.join(wout, "src")
    .select("src", "dst", (F.col("weight") / F.col("wout")).alias("frac"))
    .repartition(p, "src")
    .persist()
)
edges_prep.count()
dangling = verts.join(
    directed.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
).persist()
n_dang = dangling.count()
print(f"dangling vertices: {n_dang}", flush=True)

damping = 0.85
rows = []
state = verts.withColumn("rank", F.lit(1.0 / n)).persist()
state.count()
t_all0 = time.perf_counter()
for it in range(1, ITERS + 1):
    t0 = time.perf_counter()
    dm_df = state.join(dangling, "vid", "semi").agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
    )
    contribs = edges_prep.join(
        state.withColumnRenamed("vid", "src"), "src"
    ).select("dst", (F.col("rank") * F.col("frac")).alias("contrib"))
    summed = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
    new_ranks = (
        verts.join(summed.withColumnRenamed("dst", "vid"), "vid", "left")
        .crossJoin(F.broadcast(dm_df))
        .select(
            "vid",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
            ).alias("rank"),
        )
    )
    t1 = time.perf_counter()
    j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    prepared = new_ranks.persist()
    prepared.count()
    t2 = time.perf_counter()
    tc0 = t2
    if it % 3 == 0:
        prepared2 = prepared.localCheckpoint(eager=True)
    else:
        prepared2 = prepared
    t3 = time.perf_counter()
    state.unpersist()
    if prepared2 is not prepared:
        prepared.unpersist()
    state = prepared2
    t4 = time.perf_counter()
    rows.append((it, t1 - t0, t2 - t1, t3 - t2, t4 - t3))
    print(
        f"iter {it:2d}  build {t1-t0:6.3f}  count {t2-t1:6.3f}  "
        f"ckpt {t3-t2:6.3f}  unper {t4-t3:6.3f}  total {t4-t0:6.3f}",
        flush=True,
    )
tot = time.perf_counter() - t_all0
b = sum(r[1] for r in rows); c = sum(r[2] for r in rows)
k = sum(r[3] for r in rows); u = sum(r[4] for r in rows)
print(f"TOTAL {tot:.3f}  build {b:.3f}  count {c:.3f}  ckpt {k:.3f}  unper {u:.3f}")
spark.stop()
