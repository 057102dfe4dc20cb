"""End-to-end pipeline job (jobs/run_pipeline.py) smoke + the
distributed page generator's byte-identity with the driver-side twin."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from comm_detect_spark.sources.pages import (
    generate_pages,
    generate_pages_distributed,
)


@pytest.fixture(scope="module")
def planted():
    """60 pages: ring + chord links, sorted (src, dst) so both generators
    render out-links in the same order."""
    n = 60
    src = np.concatenate([np.arange(n), np.arange(n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) * 7 + 3) % n])
    keep = src != dst
    order = np.lexsort((dst[keep], src[keep]))
    return n, src[keep][order], dst[keep][order]


class TestDistributedGenerator:
    def test_byte_identity_with_driver_twin(self, spark, planted):
        """generate_pages_distributed == generate_pages row-for-row (html
        bytes included) on the same sorted edge set."""
        n, s, d = planted
        want = generate_pages(spark, n, s, d)
        edges = spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(s, d)], "src long, dst long"
        )
        got = generate_pages_distributed(spark, n, edges)
        cols = ["url", "warc_ts", "lang"]
        assert (
            got.select(*cols, F.sha2("html", 256).alias("h"),
                       F.sha2(F.col("text").cast("binary"), 256).alias("t"))
            .exceptAll(
                want.select(*cols, F.sha2("html", 256).alias("h"),
                            F.sha2(F.col("text").cast("binary"), 256)
                            .alias("t"))
            )
            .count()
            == 0
        )
        assert got.count() == n

    def test_pages_without_outlinks_rendered(self, spark):
        """Vertices absent from the edge src column still get pages."""
        edges = spark.createDataFrame([(0, 1)], "src long, dst long")
        got = generate_pages_distributed(spark, 4, edges)
        assert got.count() == 4
        assert got.where(F.col("text").isNull()).count() == 0


class TestPipelineSmoke:
    def test_end_to_end_stages(self, spark, planted, tmp_path):
        """Every stage runs, writes parquet, and reports a timing; the
        corpus tail is consistent (splits cover kept docs; shard offsets
        are a packing of their token counts)."""
        from jobs.run_pipeline import run_pipeline

        n, s, d = planted
        pages = generate_pages(spark, n, s, d)
        out = str(tmp_path / "pipe")
        report = run_pipeline(
            spark, pages, out, iterations=2, shard_tokens=200,
            quality_kwargs={
                "min_tokens": 5,
                "min_quality": 0.0,
                "allowed_langs": ("und",),
                "max_dup_2gram": 1.0,
                "max_top_token": 1.0,
            },
        )
        for name in [
            "extract_graph", "host_graph", "pagerank_iters", "louvain",
        ]:
            assert name in report["stages"], name
        for name in [
            "url_edges", "edges", "vertices", "host_rank", "page_rank",
            "communities", "quality", "keep_list", "split", "shards",
        ]:
            assert report["rows"][name] > 0, name
        # report is the job's stdout contract — must be JSON-serializable
        json.dumps(report)
        # graph side: every page ranked and labeled
        assert report["rows"]["page_rank"] == report["rows"]["vertices"]
        assert report["rows"]["communities"] == report["rows"]["vertices"]
        # corpus side: split and shards cover exactly the final keep set
        keep = spark.read.parquet(f"{out}/keep_list")
        n_final = keep.where("keep").count()
        assert report["rows"]["split"] == n_final
        assert report["rows"]["shards"] == n_final
        shards = spark.read.parquet(f"{out}/shards")
        assert shards.agg(F.max("shard_id")).first()[0] >= 0
