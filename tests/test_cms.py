"""Count-min sketch — overestimate guarantee, exactness without
collisions, mergeability, weighted counts, streaming twin parity."""

from pyspark.sql import functions as F

from comm_detect_spark.operators.cms import cms_estimate, cms_sketch

SF = "/root/testdata/sf0.001"


def _keys_df(spark, items):
    return spark.createDataFrame([(str(x),) for x in items], "k string")


class TestCmsSketch:
    def test_estimates_never_underestimate(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        sk = cms_sketch(ev, "user_id", depth=4, width=16, seed=42)
        keys = ev.select(F.col("user_id").alias("k")).distinct()
        est = {
            r["k"]: r["est"]
            for r in cms_estimate(sk, keys, depth=4, width=16).collect()
        }
        true = {
            str(r["user_id"]): r["c"]
            for r in ev.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("c")
            ).collect()
        }
        assert est.keys() == true.keys()
        assert all(est[k] >= true[k] for k in true)
        # width 16 on hundreds of keys MUST collide somewhere
        assert any(est[k] > true[k] for k in true)

    def test_exact_when_width_dwarfs_keys(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "k string"
        )
        sk = cms_sketch(df, "k", depth=4, width=4096)
        est = {
            r["k"]: r["est"]
            for r in cms_estimate(
                sk, _keys_df(spark, ["a", "b", "c", "ghost"]), width=4096
            ).collect()
        }
        assert est == {"a": 5, "b": 3, "c": 1, "ghost": 0}

    def test_sketches_merge_by_cell_sum(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        a = ev.where(F.col("event_id") % 2 == 0)
        b = ev.where(F.col("event_id") % 2 == 1)
        whole = {
            (r["d"], r["bucket"]): r["cnt"]
            for r in cms_sketch(ev, "user_id", width=32).collect()
        }
        merged = {}
        for part in (a, b):
            for r in cms_sketch(part, "user_id", width=32).collect():
                key = (r["d"], r["bucket"])
                merged[key] = merged.get(key, 0) + r["cnt"]
        assert merged == whole

    def test_weighted_counts(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 2)], "k string, w long"
        )
        sk = cms_sketch(df, "k", width=4096, weight_col="w")
        est = {
            r["k"]: r["est"]
            for r in cms_estimate(
                sk, _keys_df(spark, ["a", "b"]), width=4096
            ).collect()
        }
        assert est == {"a": 15, "b": 2}


class TestWindowedCmsStream:
    def test_matches_batch_per_window_sketch(self, spark, tmp_path):
        from tests.test_streaming import _run_stream

        batch = spark.read.parquet(f"{SF}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        src_dir = str(tmp_path / "evcms")
        batch.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        from comm_detect_spark.streaming.pipeline import windowed_cms_stream

        _run_stream(
            windowed_cms_stream(stream, depth=2, width=16),
            "win_cms",
            "complete",
        )
        got = {
            (r["hour_epoch"], r["d"], r["bucket"]): r["cnt"]
            for r in spark.sql("SELECT * FROM win_cms").collect()
        }
        # batch twin: the same explode/bucket/sum grouped by the hour
        ev = batch.select(
            F.unix_timestamp(F.date_trunc("hour", "ts"))
            .cast("bigint")
            .alias("hour_epoch"),
            F.col("user_id").cast("string").alias("k"),
            F.explode(F.sequence(F.lit(0), F.lit(1))).alias("d"),
        )
        from comm_detect_spark.operators.cms import _bucket

        want = {
            (r["hour_epoch"], r["d"], r["bucket"]): r["cnt"]
            for r in ev.select(
                "hour_epoch", "d", _bucket(42, 16).alias("bucket")
            )
            .groupBy("hour_epoch", "d", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert got == want and len(got) > 0
