"""Phase timing of corpus_dedup at sf0.1: exact edges, LSH edges, CC, quality."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.operators.dedup import exact_duplicates, minhash_lsh_pairs
from comm_detect_spark.operators.components import connected_components

spark = get_spark(app_name="debug-corpus", cores=CPUS, shuffle_partitions=CPUS)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

for rep in range(2):
    t0 = time.perf_counter()
    ids = docs.select(F.col("doc_id").alias("vid"))
    exact = (
        exact_duplicates(docs, "doc_id", "text")
        .where(F.col("id") != F.col("keep_id"))
        .select(F.col("id").alias("src"), F.col("keep_id").alias("dst"))
    )
    ne = exact.count()
    t1 = time.perf_counter()
    lsh = minhash_lsh_pairs(docs, "doc_id", "text", 3, 8, 4).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    nl = lsh.count()
    t2 = time.perf_counter()
    und = exact.unionAll(lsh)
    edges = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    comp = connected_components(spark, edges, vertices=ids)
    nc = comp.count()
    t3 = time.perf_counter()
    print(
        f"rep{rep}: exact {t1-t0:.3f} ({ne})  lsh {t2-t1:.3f} ({nl})  "
        f"cc {t3-t2:.3f} ({nc})", flush=True,
    )
spark.stop()
