"""Sessionization: gap-based event sessions (the classic clickstream
operator; gaps-and-islands in SQL terms).

The reference engine has no event/session surface (SURVEY §2: batch graph
kernels only) — this extends the events-table pipeline alongside
events_hourly. Spark-first: the whole operator is the BUILT-IN
``session_window`` (Spark 3.2+), which runs identically in batch and
Structured Streaming — the streaming twin (streaming/pipeline.py:
sessions_stream) is the same groupBy with a watermark, not a reimplementation.

Semantics (pinned by the DuckDB gaps-and-islands oracle, driver query
sessions_30m, and a hand-built boundary case in tests/test_sessions.py):
two consecutive events of a user belong to the same session iff
ts_next - ts_prev <= gap — the boundary is INCLUSIVE, an event at exactly
prev + gap still merges (session_window treats its [min_ts, max_ts + gap]
extent as closed for merging). session_start = min ts,
session_end = max ts + gap, both truncated
to epoch seconds in the output (unix_timestamp semantics, cross-engine
exact; DuckDB's CAST(double AS BIGINT) ROUNDS, so the oracle truncates via
date_trunc('second') first).

100 TB shape: ONE shuffle on user_id; Spark merges session windows with a
sort within the hash partition — no per-user driver loop, no SinglePartition
window. Caveat the plan can't fix: a single pathological key (a bot with
10^8 events) serializes its own merge — upstream cap or per-day pre-split
of known-hot keys is the standard mitigation, same story as the pagerank
hub salting (pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session rollup: (user_id, session_start, session_end, n_events,
    total_value). Epochs are BIGINT seconds; total_value is rounded to 6
    decimals (sum order differs across engines/partitions — same
    convention as events_hourly)."""
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).alias("value"),
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias(
                "session_start"
            ),
            F.unix_timestamp(F.col("w.end")).cast("bigint").alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        )
    )
