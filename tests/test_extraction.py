"""pages -> text/link extraction parity (north-rule input_hint: extracted
text must be byte-identical per url; link extraction must reproduce the
planted graph exactly)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from comm_detect_spark import oracle
from comm_detect_spark.functions.html import extract_links_py, extract_text_py, text_udf
from comm_detect_spark.sources.pages import (
    generate_pages,
    page_url,
    pages_to_graph,
)


@pytest.fixture(scope="module")
def planted():
    """Directed planted graph on 60 pages: ring + chords."""
    n = 60
    src = np.concatenate([np.arange(n), np.arange(n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) * 7 + 3) % n])
    keep = src != dst
    return n, src[keep], dst[keep]


@pytest.fixture(scope="module")
def pages(spark, planted):
    n, s, d = planted
    return generate_pages(spark, n, s, d).persist()


class TestTextExtraction:
    def test_byte_identity_via_spark(self, pages):
        """sha256(text_udf(html)) == sha256(text) per url — THE gate."""
        mismatches = (
            pages.select(
                "url",
                F.sha2(F.col("text").cast("binary"), 256).alias("want"),
                F.sha2(text_udf(F.col("html")).cast("binary"), 256).alias("got"),
            )
            .where(F.col("want") != F.col("got"))
            .count()
        )
        assert mismatches == 0

    def test_scalar_extractor_skips_script(self):
        html = b"<html><head><script>var x=1;</script></head><body>a  b\n c</body></html>"
        assert extract_text_py(html) == "a b c"

    def test_link_resolution(self):
        html = b'<a href="/p/5">x</a><a href="https://other.example/q#frag">y</a>'
        got = extract_links_py(html, "https://site0.example/p/0")
        assert got == ["https://site0.example/p/5", "https://other.example/q"]


class TestEdgeExtraction:
    def test_planted_graph_reproduced(self, spark, planted, pages):
        n, s, d = planted
        vertices, edges = pages_to_graph(pages)
        # vids are minted over sorted urls; map back to page index via url
        v = {r["url"]: r["vid"] for r in vertices.collect()}
        idx_of_vid = {v[page_url(i)]: i for i in range(n)}
        got = {
            (idx_of_vid[r["src"]], idx_of_vid[r["dst"]])
            for r in edges.collect()
        }
        want = {(int(a), int(b)) for a, b in zip(s, d)}
        assert got == want

    def test_vid_minting_deterministic(self, spark, pages):
        v1, _ = pages_to_graph(pages)
        v2, _ = pages_to_graph(pages)
        assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, v2.collect()))
        # dense 0..n-1
        vids = sorted(r["vid"] for r in v1.collect())
        assert vids == list(range(len(vids)))
