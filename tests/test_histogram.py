"""Fixed-bin histogram — exact counts, negative/float binning,
mergeability, quantile-edge convention."""

import pytest
from pyspark.sql import functions as F

from comm_detect_spark.operators.histogram import (
    binned_histogram,
    histogram_quantiles,
)

SF = "/root/testdata/sf0.001"


class TestBinnedHistogram:
    def test_counts_match_exact_groupby(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        got = {
            r["bin"]: r["cnt"]
            for r in binned_histogram(ev, "value", bin_width=0.5).collect()
        }
        want = {
            r["b"]: r["c"]
            for r in ev.groupBy(
                F.floor(F.col("value") / 0.5).cast("bigint").alias("b")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        assert got == want and len(got) > 1

    def test_negative_values_floor(self, spark):
        df = spark.createDataFrame(
            [(-0.1,), (-1.0,), (0.0,), (0.9,), (None,)], "v double"
        )
        got = {
            r["bin"]: r["cnt"]
            for r in binned_histogram(df, "v", bin_width=1.0).collect()
        }
        assert got == {-1: 2, 0: 2}  # floor(-0.1)=-1; NULL dropped

    def test_merge_by_cell_sum(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        whole = {
            r["bin"]: r["cnt"]
            for r in binned_histogram(ev, "value").collect()
        }
        merged = {}
        for part in (
            ev.where(F.col("event_id") % 2 == 0),
            ev.where(F.col("event_id") % 2 == 1),
        ):
            for r in binned_histogram(part, "value").collect():
                merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
        assert merged == whole

    def test_grouped(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        rows = binned_histogram(
            ev, "value", group_col="event_type"
        ).collect()
        assert {r["grp"] for r in rows} == {
            r["event_type"]
            for r in ev.select("event_type").distinct().collect()
        }


class TestHistogramQuantiles:
    def test_known_distribution(self, spark):
        # 1..100 with bin_width 10: p50 -> bin of value 50 = bin 5,
        # edge 50.0; p95 -> value 95 -> bin 9, edge 90.0
        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)], "v double"
        )
        h = binned_histogram(df, "v", bin_width=10.0)
        q = histogram_quantiles(h, [0.5, 0.95, 1.0], bin_width=10.0)
        assert q == [50.0, 90.0, 100.0]

    def test_edge_error_bounded_by_bin_width(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        h = binned_histogram(ev, "value", bin_width=0.25)
        (p50,) = histogram_quantiles(h, [0.5], bin_width=0.25)
        exact = ev.approxQuantile("value", [0.5], 0.0)[0]
        assert abs(p50 - exact) <= 0.25

    def test_bad_prob_raises(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        h = binned_histogram(df, "v")
        with pytest.raises(ValueError):
            histogram_quantiles(h, [1.5])


class TestWindowedHistogramStream:
    def test_matches_batch_per_window_histogram(self, spark, tmp_path):
        from tests.test_streaming import _run_stream

        from comm_detect_spark.streaming.pipeline import (
            windowed_histogram_stream,
        )

        batch = spark.read.parquet(f"{SF}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        src_dir = str(tmp_path / "evhist")
        batch.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        _run_stream(
            windowed_histogram_stream(stream, bin_width=0.5),
            "win_hist",
            "complete",
        )
        got = {
            (r["hour_epoch"], r["bin"]): r["cnt"]
            for r in spark.sql("SELECT * FROM win_hist").collect()
        }
        want = {
            (r["hour_epoch"], r["bin"]): r["cnt"]
            for r in batch.where(F.col("value").isNotNull())
            .groupBy(
                F.unix_timestamp(F.date_trunc("hour", "ts"))
                .cast("bigint")
                .alias("hour_epoch"),
                F.floor(F.col("value") / 0.5).cast("bigint").alias("bin"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert got == want and len(got) > 0
