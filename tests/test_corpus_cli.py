"""jobs/run_corpus.py task dispatch, in-process (the operators themselves
are gated elsewhere — this covers the CLI arg plumbing users touch, without
a per-task JVM spin-up; the spark-submit e2e for the heaviest task lives in
test_submit.py)."""

import sys

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture
def run_cli(spark, monkeypatch):
    """Invoke run_corpus.main() with argv, shielding the shared test
    session from the job's final spark.stop()."""
    import importlib

    root = __file__.rsplit("/tests/", 1)[0]
    sys.path.insert(0, f"{root}/jobs")
    run_corpus = importlib.import_module("run_corpus")
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    def invoke(*argv):
        monkeypatch.setattr(sys, "argv", ["run_corpus.py", *argv])
        run_corpus.main()

    yield invoke
    sys.path.remove(f"{root}/jobs")


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "totally different words live here in this document"),
        ],
        "doc_id BIGINT, text STRING",
    )


def test_cli_decontaminate(spark, tmp_path, run_cli):
    docs_p = str(tmp_path / "docs.parquet")
    bench_p = str(tmp_path / "bench.parquet")
    out = str(tmp_path / "decon")
    _docs(spark).write.parquet(docs_p)
    spark.createDataFrame(
        [("one two three four five six seven eight nine ten",)], "text STRING"
    ).write.parquet(bench_p)
    run_cli("--task", "decontaminate", "--docs", docs_p,
            "--benchmark", bench_p, "--out", out, "--ngram", "3")
    got = {r["id"]: r["contaminated"]
           for r in spark.read.parquet(out).collect()}
    assert got == {0: False, 1: False, 2: True, 3: False}


def test_cli_split_and_shards(spark, tmp_path, run_cli):
    docs_p = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(docs_p)
    out_split = str(tmp_path / "split")
    run_cli("--task", "split", "--docs", docs_p, "--out", out_split,
            "--splits", "train:0.5,val:0.25,test:0.25")
    splits = spark.read.parquet(out_split)
    assert splits.count() == 4
    assert set(splits.columns) == {"id", "split"}
    assert {r["split"] for r in splits.collect()} <= {"train", "val", "test"}

    out_shards = str(tmp_path / "shards")
    run_cli("--task", "shards", "--docs", docs_p, "--out", out_shards,
            "--shard-tokens", "12")
    shards = spark.read.parquet(out_shards)
    rows = sorted(shards.collect(), key=lambda r: r["start_offset"])
    assert rows[0]["start_offset"] == 0
    assert all(
        r["shard_id"] == r["start_offset"] // 12 for r in rows
    )
    # total offsets span the full token count
    total = _docs(spark).select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    last = rows[-1]
    assert last["start_offset"] < total


def test_cli_contamination(spark, tmp_path, run_cli):
    docs_p = str(tmp_path / "docs_c.parquet")
    bench_p = str(tmp_path / "bench_c.parquet")
    out_p = str(tmp_path / "contam")
    _docs(spark).write.mode("overwrite").parquet(docs_p)
    spark.createDataFrame(
        [(100, "beta gamma delta")], "doc_id BIGINT, text STRING"
    ).write.mode("overwrite").parquet(bench_p)
    run_cli("--task", "contamination", "--docs", docs_p,
            "--benchmark", bench_p, "--ngram", "3", "--out", out_p)
    got = {r["id"]: r["contamination"]
           for r in spark.read.parquet(out_p).collect()}
    # docs 0/1: shingles of 6 words = 4; "beta gamma delta" is 1 of them
    assert got[0] == got[1] == 0.25
    assert got[2] == 0.0 and got[3] == 0.0


def test_cli_ann_batch(spark, tmp_path, run_cli):
    emb_p = str(tmp_path / "emb.parquet")
    q_p = str(tmp_path / "qv.parquet")
    out_p = str(tmp_path / "annb")
    rows = [(i, [1.0, float(i)]) for i in range(6)]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(emb_p)
    spark.createDataFrame(
        rows[:1], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(q_p)
    run_cli("--task", "ann-batch", "--docs", emb_p, "--queries", q_p,
            "--topk", "2", "--out", out_p)
    got = sorted(
        (r["rnk"], r["id"]) for r in spark.read.parquet(out_p).collect()
    )
    # query (1,0): best cosine is itself, then (1,1)
    assert got == [(1, 0), (2, 1)]
