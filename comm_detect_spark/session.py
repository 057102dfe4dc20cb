"""SparkSession factory with scale-oriented defaults.

Local mode stands in for a multi-executor cluster (BASELINE.md protocol:
local[8] vs local[32] evidences N->4N executor scaling). All settings are
chosen for the 100 TB case and merely *sized down* locally:

* AQE on: runtime coalescing of shuffle partitions, skew-join splitting for
  hub vertices (web graphs are power-law; a few dst keys dominate).
* Arrow enabled: every Python-side kernel is an Arrow-batched pandas UDF
  (no per-row Python anywhere — BASELINE.json input_hint).
* shuffle partitions default to 2x cores locally; on a real cluster this is
  set to ~2-3x total executor cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "comm-detect-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) or 32.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cores = int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # --- adaptive execution: the runtime re-planner we rely on at scale
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- arrow for every pandas UDF / applyInPandas kernel
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # --- broadcast threshold: vertex-state tables late in Louvain are
        #     tiny; let them broadcast aggressively
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed tables (sources/bucketed.py) land here, not in
        # ./spark-warehouse; per-process default so two concurrent sessions
        # (e.g. parallel test runs) never race on saveAsTable overwrite of
        # the same table name
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR", f"/tmp/spark-warehouse-{os.getpid()}"
            ),
        )
    )
    # shuffle/spill dirs on tmpfs when available: local[N] puts N writers on
    # one filesystem; on the sandbox's overlay disk that serializes at high
    # core counts (measured: 32-core iterations slower than 8-core). On a
    # real cluster this is per-executor NVMe via spark.local.dir anyway.
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
