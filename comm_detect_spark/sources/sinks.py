"""Result sinks.

The reference emits DIMACS-10-challenge text: line i = community label of
node i-1 (plp.cc:136-147, plm.cc:453-464; read back by
communities_from_file, modularity.h:115-146). We keep that format for
parity tooling, plus the production parquet sink (state snapshots are the
real output — CheckpointStore).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_labels_text(state: DataFrame, path: str, value_col: str = "label") -> None:
    """Label-per-line text in vid order (single file — a parity/debug
    format, not a scale format). Streams sorted partitions through the
    driver one at a time (toLocalIterator) instead of collect()ing the
    whole vertex state, so driver memory stays bounded by one partition
    even when the debug format is (mis)used on a large graph."""
    with open(path, "w") as fh:
        for r in state.select("vid", value_col).orderBy("vid").toLocalIterator():
            fh.write(f"{r[value_col]}\n")


def read_labels_text(spark: SparkSession, path: str) -> DataFrame:
    """communities_from_file (modularity.h:115-146) as a DataFrame:
    (vid, label) with vid = line number - 1."""
    with open(path) as fh:
        labels = [int(line) for line in fh if line.strip()]
    return spark.createDataFrame(
        list(enumerate(labels)), "vid BIGINT, label BIGINT"
    )


def write_labels_parquet(state: DataFrame, path: str) -> None:
    state.write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key: str = "vid",
) -> None:
    """Persist an algorithm output hash-BUCKETED by its join key, so every
    downstream consumer (url mapping, per-community metrics, the next
    pipeline stage) starts co-partitioned and skips one exchange — cheap at
    write time, saved once per consumer. Uses the catalog bucketed-table
    path (`bucketBy` + external `path`): plain parquet files carry no
    bucketing metadata Spark can trust, the table registration is what
    lets the planner drop the shuffle (asserted on the plan in
    tests/test_plans.py). On a real deployment this is the Iceberg
    `bucket(N, vid)` partition transform — same seam as
    plans/checkpoint.py."""
    (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
