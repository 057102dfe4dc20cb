"""Structured Streaming twins == their batch operators (file source,
trigger(availableNow=True), memory sink — the standard batch-parity rig)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from comm_detect_spark.operators.dedup import exact_duplicates
from comm_detect_spark.streaming.pipeline import (
    events_hourly_stream,
    streaming_exact_dedup,
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


class TestEventsHourlyStream:
    def test_matches_batch_rollup(self, spark, tmp_path):
        batch = spark.read.parquet(f"{SF}/events.parquet")
        src_dir = str(tmp_path / "events")
        batch.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(batch.schema).parquet(src_dir)
        _run_stream(
            events_hourly_stream(stream), "ev_hourly", "complete"
        )
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM ev_hourly").collect())
        )
        want = sorted(
            map(
                tuple,
                batch.groupBy(
                    "user_id",
                    F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
                    .cast("bigint")
                    .alias("hour_epoch"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.round(F.sum("value"), 6).alias("total_value"),
                )
                .collect(),
            )
        )
        assert got == want


class TestStreamingExactDedup:
    def test_one_survivor_per_content_hash(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
            "ingest_ts", F.current_timestamp()
        )
        src_dir = str(tmp_path / "docs")
        docs.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            streaming_exact_dedup(stream), "docs_dedup", "append"
        )
        got = spark.sql("SELECT * FROM docs_dedup")
        # exactly one survivor per content hash, same hash set as batch
        assert got.groupBy("content_hash").count().where(
            F.col("count") > 1
        ).count() == 0
        batch_hashes = {
            r["content_hash"]
            for r in exact_duplicates(
                spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", "text"
            ).collect()
        }
        stream_hashes = {r["content_hash"] for r in got.collect()}
        assert stream_hashes == batch_hashes


class TestStreamingDecontaminate:
    def test_matches_batch_decontaminate(self, spark, tmp_path):
        """Append-mode streaming decontamination == the batch operator's
        contaminated set, with identical distinct-leaked-shingle counts
        (the stateless array_intersect form must not change semantics)."""
        from comm_detect_spark.operators.dedup import decontaminate
        from comm_detect_spark.streaming.pipeline import streaming_decontaminate

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        bench = docs.where(F.col("doc_id") % 10 == 0).select("text")
        src_dir = str(tmp_path / "docs_decon")
        docs.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(docs.schema).parquet(src_dir)
        _run_stream(
            streaming_decontaminate(stream, bench, n=3),
            "docs_decon", "append",
        )
        got = {
            (r["id"], r["hits"])
            for r in spark.sql("SELECT * FROM docs_decon").collect()
        }
        want = {
            (r["id"], r["hits"])
            for r in decontaminate(
                docs, bench.select(F.col("text")), n=3
            ).collect()
            if r["contaminated"]
        }
        assert got == want and len(got) > 0


class TestWordcountWindowedStream:
    def test_matches_batch_counts(self, spark, tmp_path):
        """Stream (complete mode, availableNow) == the batch per-window
        token counts over the same documents-with-timestamps source."""
        from comm_detect_spark.streaming.pipeline import (
            wordcount_windowed_stream,
        )

        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .limit(80)
            .select(
                "doc_id",
                "text",
                F.timestamp_seconds(
                    F.lit(1700000000) + (F.col("doc_id") % 7) * 1800
                ).alias("ingest_ts"),
            )
        )
        src_dir = str(tmp_path / "docs_ts")
        docs.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            wordcount_windowed_stream(stream), "wc_windowed", "complete"
        )
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM wc_windowed").collect())
        )
        batch = spark.read.parquet(src_dir)
        want = sorted(
            map(
                tuple,
                batch.select(
                    F.col("ingest_ts").cast("timestamp").alias("ts"),
                    F.explode(
                        F.split(F.lower(F.trim(F.col("text"))), r"\s+")
                    ).alias("token"),
                )
                .where(F.col("token") != "")
                .groupBy(F.window("ts", "1 hour").alias("w"), "token")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.unix_timestamp(F.col("w.start"))
                    .cast("bigint")
                    .alias("window_epoch"),
                    "token",
                    "n",
                )
                .collect(),
            )
        )
        assert got == want
        assert len(got) > 0


class TestStreamingSegmentFilter:
    def test_one_survivor_per_segment_and_batch_hash_set(
        self, spark, tmp_path
    ):
        from comm_detect_spark.operators.dedup import doc_segments
        from comm_detect_spark.streaming.pipeline import (
            streaming_segment_filter,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
            "ingest_ts", F.current_timestamp()
        )
        src_dir = str(tmp_path / "segdocs")
        docs.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            streaming_segment_filter(stream, tokens_per_segment=8),
            "seg_filter",
            "append",
        )
        got = spark.sql("SELECT * FROM seg_filter")
        assert got.groupBy(F.md5("segment")).count().where(
            F.col("count") > 1
        ).count() == 0
        # the surviving segment SET equals the batch winners' set (the
        # keep-rules differ only in WHICH occurrence survives)
        batch_set = {
            r["segment"]
            for r in doc_segments(
                spark.read.parquet(f"{SF}/documents.parquet"),
                tokens_per_segment=8,
            )
            .select("segment")
            .distinct()
            .collect()
        }
        assert {r["segment"] for r in got.collect()} == batch_set

    def test_batch_winner_parity_in_doc_order(self, spark, tmp_path):
        """When arrival order == (doc_id, seg_idx) order (one input file,
        sorted), the stream's first-arrival keep equals batch
        segment_dedup's global-minimum keep exactly."""
        from comm_detect_spark.operators.dedup import segment_dedup
        from comm_detect_spark.streaming.pipeline import (
            streaming_segment_filter,
        )

        rows = [
            (1, "a b c d"),
            (2, "c d e f"),
            (3, "a b"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string"
        ).withColumn("ingest_ts", F.current_timestamp())
        src_dir = str(tmp_path / "mini")
        docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(
            src_dir
        )
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            streaming_segment_filter(stream, tokens_per_segment=2),
            "seg_filter_mini",
            "append",
        )
        got = {
            (r["doc_id"], r["seg_idx"]): r["segment"]
            for r in spark.sql("SELECT * FROM seg_filter_mini").collect()
        }
        assert got == {(1, 0): "a b", (1, 1): "c d", (2, 1): "e f"}
        # and reassembling the survivors equals batch segment_dedup
        want = {
            r["doc_id"]: r["text_clean"]
            for r in segment_dedup(
                docs.drop("ingest_ts"), tokens_per_segment=2
            ).collect()
        }
        assert want == {1: "a b c d", 2: "e f"}


class TestWindowedDistinctStream:
    def test_matches_batch_sketches(self, spark, tmp_path):
        """Streamed per-(window, trial) bit_or sketches folded to b_sum ==
        the batch operator exactly (bit_or is order-independent)."""
        from comm_detect_spark.operators.anf import windowed_distinct_b_sums
        from comm_detect_spark.streaming.pipeline import (
            windowed_distinct_stream,
        )

        batch = spark.read.parquet(f"{SF}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        src_dir = str(tmp_path / "evd")
        batch.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            windowed_distinct_stream(stream, trials=4),
            "win_distinct",
            "complete",
        )
        per_trial = spark.sql("SELECT * FROM win_distinct")
        b = F.round(
            F.log2(F.expr("(-1 - sketch) & (sketch + 1)"))
        ).cast("bigint")
        got = {
            r["hour_epoch"]: r["b_sum"]
            for r in per_trial.groupBy("hour_epoch")
            .agg(F.sum(b).alias("b_sum"))
            .collect()
        }
        want = {
            r["hour_epoch"]: r["b_sum"]
            for r in windowed_distinct_b_sums(batch, trials=4).collect()
        }
        assert got == want and len(got) > 0


class TestStreamingStratifiedSample:
    def test_matches_batch_stratified_sample(self, spark, tmp_path):
        """Append-mode streaming stratified sampling == the batch
        operator's kept set (the membership rule is a pure per-row
        expression, so the twin must make bit-identical decisions)."""
        from comm_detect_spark.operators.corpus import stratified_sample
        from comm_detect_spark.streaming.pipeline import (
            streaming_stratified_sample,
        )

        fr = {"en": 0.5, "zh": 0.3, "de": 0.25}
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        src_dir = str(tmp_path / "docs_strat")
        docs.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(docs.schema).parquet(src_dir)
        _run_stream(
            streaming_stratified_sample(
                stream, "lang", fr, default_fraction=0.1
            ).select("doc_id", "lang"),
            "docs_strat", "append",
        )
        got = {
            (r["doc_id"], r["lang"])
            for r in spark.sql("SELECT * FROM docs_strat").collect()
        }
        want = {
            (r["doc_id"], r["lang"])
            for r in stratified_sample(
                docs, "lang", fr, default_fraction=0.1
            ).select("doc_id", "lang").collect()
        }
        assert got == want and 0 < len(got) < docs.count()


class TestStreamingNgramContamination:
    def test_matches_batch_ngram_contamination(self, spark, tmp_path):
        """Append-mode streaming graded contamination == the batch
        operator row-for-row (n_shingles, n_hit, contamination) — the
        stateless array-expression form must not change semantics."""
        from comm_detect_spark.operators.dedup import ngram_contamination
        from comm_detect_spark.streaming.pipeline import (
            streaming_ngram_contamination,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        corpus = docs.where(F.col("doc_id") % 10 != 0)
        bench = docs.where(F.col("doc_id") % 10 == 0)
        src_dir = str(tmp_path / "docs_ngc")
        corpus.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(corpus.schema).parquet(src_dir)
        _run_stream(
            streaming_ngram_contamination(stream, bench, n=3),
            "docs_ngc", "append",
        )
        got = {
            (r["id"], r["n_shingles"], r["n_hit"], r["contamination"])
            for r in spark.sql("SELECT * FROM docs_ngc").collect()
        }
        want = {
            (r["id"], r["n_shingles"], r["n_hit"], r["contamination"])
            for r in ngram_contamination(corpus, bench, n=3).collect()
        }
        assert got == want and len(got) > 0
        assert any(h > 0 for (_, _, h, _) in got)
