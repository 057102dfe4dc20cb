"""Bucketed edge storage — the cluster-scale version of the cached
repartition(P, src) that lpa_sync/pagerank rely on locally.

On a real cluster the iterated edge table should be WRITTEN bucketed by
``src`` once, so every subsequent run's per-sweep ``edges ⋈ state`` join
needs no exchange on the edge side at all (only the vertex-sized state
moves). Spark's bucketing contract: a table written with
``bucketBy(n, "src")`` scans with outputPartitioning
HashPartitioning(src, n); a join keyed on src whose other side is hash
partitioned to the same n inserts NO Exchange above the scan
(tests/test_plans.py::TestShuffleBudget asserts this).

Uses saveAsTable (bucket metadata lives in the session catalog; on a real
deployment that is the Hive/Iceberg catalog — Iceberg bucket-partition
transforms are the equivalent seam, see plans/checkpoint.py for the same
isolation note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(
    edges: DataFrame, table: str, buckets: int, sort: bool = True
) -> None:
    """Persist edges(src, dst, weight) bucketed (and sorted) by src."""
    writer = edges.write.format("parquet").bucketBy(buckets, "src")
    if sort:
        writer = writer.sortBy("src", "dst")
    writer.mode("overwrite").saveAsTable(table)


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Scan carrying HashPartitioning(src, buckets) — join on src without
    an edge-side exchange (provided bucketed reads are enabled, the
    default: spark.sql.sources.bucketing.enabled)."""
    return spark.table(table)
