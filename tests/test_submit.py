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


@pytest.mark.slow
def test_spark_submit_pages_pipeline(spark, tmp_path):
    """--pages path: extraction -> vid minting -> pagerank in a separate
    JVM; the url->vid mapping must be written and cover isolated pages."""
    import numpy as np

    from comm_detect_spark.sources.pages import generate_pages

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "comm_detect_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package.py"),
         "--out", zip_path],
        check=True, cwd=root,
    )
    # planted graph with an isolated page (no in/out links: page 19)
    rng = np.random.default_rng(7)
    src = rng.integers(0, 18, 40)
    dst = rng.integers(0, 18, 40)
    keep = src != dst
    pages = generate_pages(spark, 20, src[keep], dst[keep])
    pages_path = str(tmp_path / "pages.parquet")
    pages.write.mode("overwrite").parquet(pages_path)
    out_path = str(tmp_path / "ranks")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(root, "jobs", "run_algorithm.py"),
         "--algo", "pagerank", "--pages", pages_path,
         "--out", out_path, "--iterations", "2"],
        check=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    verts = spark.read.parquet(f"{out_path}_vertices")
    ranks = spark.read.parquet(out_path)
    n_pages = 20
    assert verts.count() == n_pages  # every page minted, incl. isolated
    assert set(verts.columns) == {"url", "vid"}
    # ranks keyed over the FULL vertex set (isolated pages not dropped)
    assert ranks.count() == n_pages
    joined = ranks.join(verts, "vid")
    assert joined.count() == n_pages


@pytest.mark.slow
def test_spark_submit_louvain_resume_end_to_end(spark, tmp_path, jazz, jazz_df):
    """--algo louvain --resume through the CLI: the per-level store factory
    (run_algorithm.py's deterministic run-id sequence) is wired where users
    touch it. Scenario: a full checkpointed run, then the DEEPEST level's
    store is deleted (the crash-at-level-boundary shape) and a --resume run
    must fast-path the surviving levels, recompute the lost one, and emit
    an identical partition."""
    import shutil as _shutil

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "comm_detect_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package.py"),
         "--out", zip_path],
        check=True, cwd=root,
    )
    edges_path = str(tmp_path / "edges.parquet")
    jazz_df.write.mode("overwrite").parquet(edges_path)
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)

    def run(out, extra):
        subprocess.run(
            [spark_submit, "--master", "local[2]",
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             "--py-files", zip_path,
             os.path.join(root, "jobs", "run_algorithm.py"),
             "--algo", "louvain", "--edges", edges_path,
             "--out", out, "--num-blocks", "4",
             "--checkpoint-root", ckpt, "--run-id", "e2e"] + extra,
            check=True, cwd=str(tmp_path), env=env, timeout=420,
        )

    run(str(tmp_path / "full"), [])
    level_dirs = sorted(
        d for d in os.listdir(ckpt) if d.startswith("e2e-L")
    )
    assert len(level_dirs) >= 2  # jazz coarsens at least once
    _shutil.rmtree(os.path.join(ckpt, level_dirs[-1]))  # lose deepest level
    run(str(tmp_path / "resumed"), ["--resume"])
    full = {r["vid"]: r["label"]
            for r in spark.read.parquet(str(tmp_path / "full")).collect()}
    resumed = {r["vid"]: r["label"]
               for r in spark.read.parquet(str(tmp_path / "resumed")).collect()}
    assert resumed == full and len(full) == jazz[0]


@pytest.mark.slow
def test_spark_submit_corpus_dedup_end_to_end(spark, tmp_path):
    """jobs/run_corpus.py --task dedup in a separate JVM: the keep-list
    must mark exactly one representative per near-dup cluster."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "comm_detect_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package.py"),
         "--out", zip_path],
        check=True, cwd=root,
    )
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "THE  QUICK brown fox jumps over the lazy dog tonight"),
        (2, "a completely different document about spark engines here"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.mode(
        "overwrite"
    ).parquet(docs_path)
    out_path = str(tmp_path / "keep")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(root, "jobs", "run_corpus.py"),
         "--task", "dedup", "--docs", docs_path, "--out", out_path,
         "--min-quality", "0.0"],
        check=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    got = {r["id"]: (r["cluster"], r["keep"])
           for r in spark.read.parquet(out_path).collect()}
    assert got[0] == (0, True) and got[1] == (0, False)
    assert got[3] == (0, False)
    assert got[2][1] is True  # its own cluster's representative


@pytest.mark.slow
def test_spark_submit_ppr_with_seeds(spark, jazz, jazz_df, tmp_path):
    """--algo ppr end-to-end: the --seeds parquet path, output matches the
    NumPy oracle (run in a separate JVM via spark-submit --py-files)."""
    import numpy as np

    from comm_detect_spark import oracle

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "comm_detect_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package.py"),
         "--out", zip_path],
        check=True, cwd=root,
    )
    edges_path = str(tmp_path / "edges.parquet")
    jazz_df.write.mode("overwrite").parquet(edges_path)
    seeds_path = str(tmp_path / "seeds.parquet")
    spark.createDataFrame([(0,), (5,), (17,)], "vid BIGINT").write.mode(
        "overwrite"
    ).parquet(seeds_path)
    out_path = str(tmp_path / "ppr")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(root, "jobs", "run_algorithm.py"),
         "--algo", "ppr", "--edges", edges_path, "--seeds", seeds_path,
         "--out", out_path, "--iterations", "4"],
        check=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    n, s, d, w = jazz
    want = oracle.personalized_pagerank(
        n, s, d, seeds=[0, 5, 17], weight=w.astype(float), iterations=4
    )
    got = np.zeros(n)
    for r in spark.read.parquet(out_path).collect():
        got[r["vid"]] = r["rank"]
    assert np.allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_spark_submit_ktruss_end_to_end(spark, tmp_path, jazz, jazz_df):
    """--algo ktruss (fixpoint peel) in a separate JVM; the surviving edge
    set must equal the in-process operator's on the same input."""
    from comm_detect_spark.operators.truss import k_truss

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "comm_detect_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package.py"),
         "--out", zip_path],
        check=True, cwd=root,
    )
    edges_path = str(tmp_path / "edges.parquet")
    jazz_df.write.mode("overwrite").parquet(edges_path)
    out_path = str(tmp_path / "truss")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(root, "jobs", "run_algorithm.py"),
         "--algo", "ktruss", "--k", "5", "--edges", edges_path,
         "--out", out_path],
        check=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    got = {
        (r["a"], r["b"]): r["support"]
        for r in spark.read.parquet(out_path).collect()
    }
    want = {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(spark, jazz_df, k=5).collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_spark_submit_khop_and_transitivity(spark, tmp_path):
    """--algo khop then --algo transitivity chained end-to-end in separate
    JVMs: extract the 1-hop neighborhood of a seed on a known graph, then
    profile the extracted subgraph — the subgraph CLI output must be a
    valid edge input for every other --algo."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "comm_detect_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "package.py"),
         "--out", zip_path],
        check=True, cwd=root,
    )
    # triangle 0-1-2 reachable 1 hop out of 0 (via 0->1, 0->2), plus a
    # far chain 3->4 the 1-hop cut must exclude
    edges_path = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (1, 2, 1), (2, 0, 1), (3, 4, 1)],
        "src long, dst long, weight long",
    ).write.mode("overwrite").parquet(edges_path)
    seeds_path = str(tmp_path / "seeds.parquet")
    spark.createDataFrame([(0,)], "vid BIGINT").write.mode(
        "overwrite"
    ).parquet(seeds_path)
    sub_path = str(tmp_path / "sub")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    base = [spark_submit, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(root, "jobs", "run_algorithm.py")]
    subprocess.run(
        base + ["--algo", "khop", "--edges", edges_path,
                "--seeds", seeds_path, "--out", sub_path, "--k", "1"],
        check=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    sub = {(r["src"], r["dst"]) for r in spark.read.parquet(sub_path).collect()}
    assert sub == {(0, 1), (0, 2), (1, 2), (2, 0)}
    prof_path = str(tmp_path / "prof")
    subprocess.run(
        base + ["--algo", "transitivity", "--edges", sub_path,
                "--out", prof_path],
        check=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    row = spark.read.parquet(prof_path).collect()[0]
    assert (row["wedges"], row["triangles"], row["transitivity"]) == (3, 1, 1.0)
