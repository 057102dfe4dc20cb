"""Print the physical plan of one pagerank iteration and one lpa sweep
exactly as the bench executes them (caches in place), to check join
strategy and per-iteration sorts. (guide §1.1/§7.2)"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.graph.core import out_weights, vertex_range

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="explain-iter", cores=CPUS, shuffle_partitions=CPUS)

# small graph is fine: plan shape is size-independent at this threshold
from comm_detect_spark.sources.rmat import rmat_edges_distributed

SCALE = int(os.environ.get("PROF_SCALE", "16"))
n = 1 << SCALE
directed = rmat_edges_distributed(spark, SCALE, 8, num_partitions=CPUS).persist()
directed.count()
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
dangling.count()
state = verts.withColumn("rank", F.lit(1.0 / n)).persist()
state.count()
damping = 0.85
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
print("=" * 30, "PAGERANK ITERATION", "=" * 30)
print(new_ranks._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

from comm_detect_spark.operators.lpa import lpa_step

sym = (
    directed.select("src", "dst", "weight")
    .unionAll(directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    .where(F.col("src") != F.col("dst"))
    .groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
)
e = sym.repartition(p, "src").persist()
e.count()
lstate = verts.withColumn("label", F.col("vid")).repartition(p, "vid").persist()
lstate.count()
step = lpa_step(e, lstate, num_partitions=p)
print("=" * 30, "LPA SWEEP", "=" * 30)
print(step._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
spark.stop()
