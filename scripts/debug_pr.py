"""Debug: replicate pagerank() body EXACTLY (current r7 code) with
per-iteration timing and a plan dump of iteration 1, to find the gap vs
the variant_bench pr_all loop."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("PROF_SCALE", "20"))
EF = int(os.environ.get("PROF_EF", "12"))
ITERS = int(os.environ.get("PROF_ITERS", "10"))
if SCALE >= 19:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.graph.core import out_weights, vertex_range
from comm_detect_spark.plans.driver import IterationDriver
from comm_detect_spark.sources.rmat import rmat_edges_distributed

spark = get_spark(app_name="debug-pr", cores=CPUS, shuffle_partitions=CPUS)
n = 1 << SCALE
edges = rmat_edges_distributed(spark, SCALE, EF, num_partitions=CPUS).persist()
m = edges.count()
print(f"graph: n={n} m={m}", flush=True)

drv = IterationDriver(checkpoint_every=3)
damping = 0.85
p = CPUS
t = time.perf_counter()
verts = vertex_range(spark, n).repartition(p, "vid").persist()
wout = out_weights(edges)
edges_prep = edges.join(wout, "src").select(
    "src", "dst", (F.col("weight") / F.col("wout")).alias("frac")
)
edges_prep = edges_prep.repartition(p, "src").persist()
edges_prep.count()
print(f"setup edges_prep {time.perf_counter()-t:.3f}", flush=True)
t = time.perf_counter()
dangling = verts.join(
    edges.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
).persist()
has_dangling = dangling.count() > 0
print(f"setup dangling {time.perf_counter()-t:.3f}", flush=True)
t = time.perf_counter()
vcols = verts.join(
    F.broadcast(dangling.withColumn("_d", F.lit(True))), "vid", "left"
).select("vid", F.coalesce("_d", F.lit(False)).alias("dang"))
verts_f = vcols.repartition(p, "vid").persist()
verts_f.count()
print(f"setup verts_f {time.perf_counter()-t:.3f}", flush=True)
t = time.perf_counter()
ranks = drv.start(verts_f.withColumn("rank", F.lit(1.0 / n)))
print(f"setup start {time.perf_counter()-t:.3f}", flush=True)
for it in range(1, ITERS + 1):
    t0 = time.perf_counter()
    dm_df = ranks.agg(
        F.coalesce(
            F.sum(F.when(F.col("dang"), F.col("rank"))), F.lit(0.0)
        ).alias("dm")
    )
    rside = (
        ranks.select("vid", "rank")
        .withColumnRenamed("vid", "src")
        .hint("shuffle_hash")
    )
    contribs = edges_prep.join(rside, "src").select(
        "dst", (F.col("rank") * F.col("frac")).alias("contrib")
    )
    summed = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
    new_ranks = (
        verts_f.join(
            summed.withColumnRenamed("dst", "vid").hint("shuffle_hash"),
            "vid",
            "left",
        )
        .crossJoin(F.broadcast(dm_df))
        .select(
            "vid",
            "dang",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (
                    F.coalesce(F.col("s"), F.lit(0.0))
                    + F.col("dm") / F.lit(float(n))
                )
            ).alias("rank"),
        )
    )
    if it == 1:
        with open("/root/repo/BENCH/r07/debug_pr_plan.txt", "w") as fh:
            fh.write(new_ranks._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    ranks = drv.step(new_ranks, it)
    print(f"iter {it:2d} {time.perf_counter()-t0:6.3f}", flush=True)
out = drv.finish(ITERS)
print("sum", out.agg(F.sum("rank")).collect()[0][0])
spark.stop()
