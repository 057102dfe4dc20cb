"""Distributed DIMACS-10/METIS reader (reference format, graph.cc:5-53).

Kept as a fixture loader for parity tests (jazz.graph). Production input is
the Iceberg/Parquet ``pages`` table — this reader exists because the
reference's own test graph ships in this format.

Spark-first: sc.textFile + zipWithIndex + posexplode — the file's implicit
"line k+1 = node k-1" numbering is recovered from RDD zipWithIndex, which is
deterministic across split layouts (Hadoop text splits preserve in-file line
order and partition order follows split order). NEVER a window over
monotonically_increasing_id: that orders by a partition-layout-dependent
value, i.e. exactly the nondeterminism banned in graph/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_dimacs(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """Returns adjacency entries (src BIGINT, dst BIGINT, weight BIGINT),
    0-based (file ids are 1-based — graph.cc:40,46)."""
    rdd = spark.sparkContext.textFile(
        path, minPartitions=min_partitions or 1
    ).zipWithIndex()
    indexed = spark.createDataFrame(rdd, "value STRING, lineno BIGINT")
    header = indexed.where(F.col("lineno") == 0).collect()[0]["value"].split()
    weighted = len(header) > 2 and header[2] == "1"

    body = indexed.where(F.col("lineno") > 0).select(
        (F.col("lineno") - 1).alias("src"),
        F.split(F.trim(F.col("value")), r"\s+").alias("toks"),
    )
    body = body.where(F.col("toks")[0] != "")
    if weighted:
        # tokens alternate id weight (graph.cc:36-42)
        pairs = body.select(
            "src",
            F.posexplode("toks").alias("pos", "tok"),
        )
        ids = pairs.where(F.col("pos") % 2 == 0).select(
            "src", (F.col("pos") / 2).cast("bigint").alias("k"),
            (F.col("tok").cast("bigint") - 1).alias("dst"),
        )
        ws = pairs.where(F.col("pos") % 2 == 1).select(
            "src", ((F.col("pos") - 1) / 2).cast("bigint").alias("k"),
            F.col("tok").cast("bigint").alias("weight"),
        )
        return ids.join(ws, ["src", "k"]).select("src", "dst", "weight")
    return (
        body.select("src", F.explode("toks").alias("tok"))
        .select(
            "src",
            (F.col("tok").cast("bigint") - 1).alias("dst"),
            F.lit(1).cast("bigint").alias("weight"),
        )
    )
