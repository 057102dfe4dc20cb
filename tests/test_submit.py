"""North-rule launch path: `spark-submit --py-files comm_detect_spark.zip
jobs/run_algorithm.py` end-to-end on a tiny edge fixture (separate JVM,
nothing imported from the repo checkout inside the job beyond the zip)."""

import json
import os
import shutil
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_spark_submit_pagerank_end_to_end(spark, tmp_path, jazz, jazz_df):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the artifact the docs tell users to build
    zip_path = str(tmp_path / "comm_detect_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package.py"),
         "--out", zip_path],
        check=True, cwd=root,
    )
    edges_path = str(tmp_path / "edges.parquet")
    jazz_df.write.mode("overwrite").parquet(edges_path)
    out_path = str(tmp_path / "ranks")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(root, "jobs", "run_algorithm.py"),
         "--algo", "pagerank", "--edges", edges_path,
         "--out", out_path, "--iterations", "3"],
        check=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    got = spark.read.parquet(out_path)
    assert got.count() == jazz[0]
    assert set(got.columns) == {"vid", "rank"}
