"""Host-graph rollup — host extraction edge cases, rollup weights,
profile stats, parity with the Python URL normalizer's hostname."""

from comm_detect_spark.operators.hostgraph import (
    host_graph,
    host_of,
    host_profile,
)


class TestHostOf:
    def test_extraction_cases(self, spark):
        from pyspark.sql import functions as F

        rows = spark.createDataFrame(
            [
                ("https://Example.COM/path?q=1",),
                ("http://a.b.c:8080/x",),
                ("https://plain.org",),
                ("ftp://files.net/pub",),
                ("not a url",),
                ("  https://padded.io/x  ",),
            ],
            "u string",
        ).select(host_of("u").alias("h")).collect()
        assert [r["h"] for r in rows] == [
            "example.com", "a.b.c", "plain.org", "files.net", "", "padded.io",
        ]

    def test_matches_python_normalizer_hostname(self, spark):
        from urllib.parse import urlsplit

        urls = [
            "https://WWW.Wiki.org/A/b",
            "http://x.y:80/q?a=1#frag",
            "https://single.host",
            "http://UPPER.CASE.NET:9999/deep//path/",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        got = [r["h"] for r in df.select(host_of("u").alias("h")).collect()]
        assert got == [urlsplit(u).hostname for u in urls]


class TestHostGraph:
    def _edges(self, spark):
        return spark.createDataFrame(
            [
                ("https://a.com/1", "https://b.com/x"),
                ("https://a.com/2", "https://b.com/y"),
                ("https://a.com/3", "https://a.com/4"),  # self-loop at host
                ("https://b.com/1", "https://a.com/1"),
                ("bogus", "https://a.com/1"),  # dropped: no src host
            ],
            "src_url string, dst_url string",
        )

    def test_rollup_weights(self, spark):
        got = {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in host_graph(self._edges(spark)).collect()
        }
        assert got == {
            ("a.com", "b.com"): 2,
            ("a.com", "a.com"): 1,
            ("b.com", "a.com"): 1,
        }

    def test_profile(self, spark):
        prof = {
            r["host"]: r
            for r in host_profile(host_graph(self._edges(spark))).collect()
        }
        a = prof["a.com"]
        assert (a["out_links"], a["in_links"]) == (3, 2)
        assert (a["out_hosts"], a["in_hosts"]) == (2, 2)
        assert a["self_links"] == 1
        assert abs(a["intra_frac"] - 1 / 3) < 1e-6
        b = prof["b.com"]
        assert (b["out_links"], b["self_links"]) == (1, 0)
        assert b["intra_frac"] == 0.0

    def test_sink_host_has_null_intra(self, spark):
        e = spark.createDataFrame(
            [("https://src.org/a", "https://sink.org/b")],
            "src_url string, dst_url string",
        )
        prof = {r["host"]: r for r in host_profile(host_graph(e)).collect()}
        assert prof["sink.org"]["out_links"] == 0
        assert prof["sink.org"]["intra_frac"] is None
