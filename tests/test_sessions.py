"""Sessionization (batch session_window + gaps-and-islands semantics) and
the stateful streaming twins (sessions_stream, streaming_pack_shards)."""

import time

import pytest
from pyspark.sql import functions as F

from comm_detect_spark.operators.corpus import pack_shards
from comm_detect_spark.operators.sessions import sessionize
from comm_detect_spark.streaming.pipeline import (
    sessions_stream,
    streaming_pack_shards,
)

SF = "/root/testdata/sf0.001"


def _run_stream(df, name: str, out_mode: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(out_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


class TestSessionizeBatch:
    def test_gap_rule_exact(self, spark):
        """Hand-built boundary case, gap 30m: events at t=0, 10m, 45m,
        75m, 106m. 10m->45m (35m) splits; 45m->75m is 30m EXACTLY and
        MERGES (session_window's boundary is inclusive — this pins it);
        75m->106m (31m) splits. The DuckDB oracle's LAG > gap rule
        encodes the same semantics."""
        rows = [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),
            (1, "2024-01-01 00:45:00", 4.0),
            (1, "2024-01-01 01:15:00", 8.0),
            (1, "2024-01-01 01:46:00", 16.0),
            (2, "2024-01-01 00:00:00", 1.5),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts string, value double")
        got = sorted(
            map(tuple, sessionize(ev, gap="30 minutes").collect())
        )
        base = 1704067200  # 2024-01-01 00:00:00 UTC
        want = sorted(
            [
                (1, base, base + 600 + 1800, 2, 3.0),
                (1, base + 2700, base + 4500 + 1800, 2, 12.0),
                (1, base + 6360, base + 6360 + 1800, 1, 16.0),
                (2, base, base + 1800, 1, 1.5),
            ]
        )
        assert got == want
        # the oracle's gaps-and-islands SQL agrees on the boundary case
        import duckdb

        import __spark_entry__ as entry_mod

        con = duckdb.connect()
        import pandas as pd

        df = pd.DataFrame(
            rows, columns=["user_id", "ts", "value"]
        )
        df["ts"] = pd.to_datetime(df["ts"])
        df["event_id"] = range(len(df))
        con.register("events", df)
        oracle = sorted(
            map(
                tuple,
                con.execute(
                    entry_mod.oracle_sql()["sessions_30m"]
                ).fetchall(),
            )
        )
        assert oracle == want

    def test_events_total_preserved(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        sess = sessionize(ev)
        agg = sess.agg(
            F.sum("n_events").alias("n"),
            F.round(F.sum("total_value"), 3).alias("v"),
        ).collect()[0]
        want = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("v"),
        ).collect()[0]
        assert agg["n"] == want["n"]
        assert abs(agg["v"] - want["v"]) < 1e-3
        # sessions never overlap per user: start >= previous end is not
        # required (end includes +gap), but starts are strictly increasing
        # and each session's span covers its events
        bad = (
            sess.alias("a")
            .join(sess.alias("b"), "user_id")
            .where(
                (F.col("a.session_start") < F.col("b.session_start"))
                & (F.col("b.session_start") < F.col("a.session_end") - 1800)
            )
            .count()
        )
        assert bad == 0


class TestSessionsStream:
    def test_matches_batch_sessionize(self, spark, tmp_path):
        """Sentinel far-future event per user pushes the final watermark
        past every real session, so append mode emits them all; the
        emitted set must equal batch sessionize on the real events."""
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "user_id", "ts", "value"
        )
        sentinel = (
            ev.select("user_id")
            .distinct()
            .select(
                "user_id",
                F.lit("2100-01-01 00:00:00").cast("timestamp").alias("ts"),
                F.lit(0.0).alias("value"),
            )
        )
        src_dir = str(tmp_path / "events")
        ev.unionByName(sentinel).write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            sessions_stream(stream, watermark="2 hours"),
            "sessions_s",
            "append",
        )
        cutoff = 4102444800  # 2100-01-01
        got = sorted(
            map(
                tuple,
                spark.sql(
                    f"SELECT * FROM sessions_s WHERE session_start < {cutoff}"
                ).collect(),
            )
        )
        want = sorted(map(tuple, sessionize(ev).collect()))
        assert got == want


class TestStreamingPackShards:
    def _docs_tokens(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        from comm_detect_spark.functions.text import token_count

        return docs.select(
            "doc_id", token_count("text").cast("bigint").alias("tokens")
        )

    def test_single_batch_equals_batch_operator(self, spark, tmp_path):
        wt = self._docs_tokens(spark)
        src_dir = str(tmp_path / "docs")
        wt.coalesce(1).write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            streaming_pack_shards(
                stream, id_col="doc_id", tokens_col="tokens",
                shard_tokens=5000,
            ),
            "pack_s1",
            "append",
        )
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM pack_s1").collect())
        )
        want = sorted(
            (str(r["id"]), r["start_offset"], r["shard_id"])
            for r in pack_shards(wt, shard_tokens=5000).collect()
        )
        assert got == want

    def test_carry_across_micro_batches(self, spark, tmp_path):
        """Two files fed one-per-trigger, pre-split at the hash-order
        midpoint: the carried offset must make the two batches identical
        to one global batch run."""
        from comm_detect_spark.operators.dedup import _h60

        wt = self._docs_tokens(spark).withColumn(
            "_hk",
            _h60(F.concat(F.col("doc_id").cast("string"), F.lit("#42"))),
        )
        rows = wt.orderBy("_hk", "doc_id").collect()
        half = len(rows) // 2
        src_dir = tmp_path / "docs2"
        src_dir.mkdir()
        first = spark.createDataFrame(rows[:half], wt.schema).drop("_hk")
        second = spark.createDataFrame(rows[half:], wt.schema).drop("_hk")
        first.coalesce(1).write.mode("overwrite").parquet(
            str(src_dir / "b0")
        )
        time.sleep(1.1)  # file-source ordering is by modification time
        second.coalesce(1).write.mode("overwrite").parquet(
            str(src_dir / "b1")
        )
        stream = (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src_dir}/b*")
        )
        _run_stream(
            streaming_pack_shards(
                stream, id_col="doc_id", tokens_col="tokens",
                shard_tokens=5000,
            ),
            "pack_s2",
            "append",
        )
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM pack_s2").collect())
        )
        want = sorted(
            (str(r["id"]), r["start_offset"], r["shard_id"])
            for r in pack_shards(
                self._docs_tokens(spark), shard_tokens=5000
            ).collect()
        )
        assert got == want

    def test_null_tokens_raise(self, spark, tmp_path):
        import pyspark

        wt = self._docs_tokens(spark).withColumn(
            "tokens",
            F.when(F.col("doc_id") == 7, None).otherwise(F.col("tokens")),
        )
        src_dir = str(tmp_path / "docs_null")
        wt.coalesce(1).write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        with pytest.raises(Exception, match="NULL tokens|StreamingQuery"):
            q = (
                streaming_pack_shards(
                    stream, id_col="doc_id", tokens_col="tokens"
                )
                .writeStream.format("memory")
                .queryName("pack_null")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            if q.exception() is not None:
                raise q.exception()
