"""Bloom filter — no false negatives, deterministic false positives,
word-level mergeability, probe on missing words, streaming twin parity."""

from pyspark.sql import functions as F

from comm_detect_spark.operators.bloom import bloom_build, bloom_probe

SF = "/root/testdata/sf0.001"


def _keys_df(spark, items):
    return spark.createDataFrame([(str(x),) for x in items], "k string")


class TestBloom:
    def test_no_false_negatives(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        bl = bloom_build(ev, "user_id", num_bits=1024, num_hashes=4)
        present = ev.select(F.col("user_id").alias("k")).distinct()
        got = bloom_probe(bl, present, num_bits=1024, num_hashes=4).collect()
        assert len(got) > 0
        assert all(r["maybe_present"] for r in got)

    def test_absent_keys_mostly_false_at_generous_width(self, spark):
        df = _keys_df(spark, range(10))
        bl = bloom_build(df, "k", num_bits=4096, num_hashes=4)
        ghosts = _keys_df(spark, [f"ghost{i}" for i in range(50)])
        got = bloom_probe(bl, ghosts, num_bits=4096, num_hashes=4).collect()
        false_pos = sum(1 for r in got if r["maybe_present"])
        # 40 bits set of 4096: FP rate ~ (40/4096)^4 ~ 1e-8; 50 probes
        assert false_pos == 0

    def test_words_merge_by_bit_or(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        a = ev.where(F.col("event_id") % 2 == 0)
        b = ev.where(F.col("event_id") % 2 == 1)
        whole = {
            r["word_idx"]: r["word"]
            for r in bloom_build(ev, "user_id", num_bits=1024).collect()
        }
        merged = {}
        for part in (a, b):
            for r in bloom_build(part, "user_id", num_bits=1024).collect():
                merged[r["word_idx"]] = (
                    merged.get(r["word_idx"], 0) | r["word"]
                )
        assert merged == whole

    def test_probe_handles_absent_words(self, spark):
        bl = bloom_build(_keys_df(spark, ["x"]), "k", num_bits=4096)
        got = {
            r["k"]: r["maybe_present"]
            for r in bloom_probe(
                bl, _keys_df(spark, ["x", "far-away-key"]), num_bits=4096
            ).collect()
        }
        assert got["x"] is True
        assert got["far-away-key"] is False


class TestBloomStream:
    def test_matches_batch_per_window_filter(self, spark, tmp_path):
        from tests.test_streaming import _run_stream

        from comm_detect_spark.operators.bloom import _bitpos
        from comm_detect_spark.streaming.pipeline import bloom_stream

        batch = spark.read.parquet(f"{SF}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        src_dir = str(tmp_path / "evbloom")
        batch.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            bloom_stream(stream, num_bits=512, num_hashes=3),
            "win_bloom",
            "complete",
        )
        got = {
            (r["hour_epoch"], r["word_idx"]): r["word"]
            for r in spark.sql("SELECT * FROM win_bloom").collect()
        }
        ev = batch.select(
            F.unix_timestamp(F.date_trunc("hour", "ts"))
            .cast("bigint")
            .alias("hour_epoch"),
            F.col("user_id").cast("string").alias("k"),
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
        ).select("hour_epoch", _bitpos(42, 512).alias("pos"))
        want = {
            (r["hour_epoch"], r["word_idx"]): r["word"]
            for r in ev.select(
                "hour_epoch",
                (F.col("pos") / 64).cast("bigint").alias("word_idx"),
                F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
            )
            .groupBy("hour_epoch", "word_idx")
            .agg(F.bit_or("bit").alias("word"))
            .collect()
        }
        assert got == want and len(got) > 0
