"""URL normalization: scalar and JVM column flavors must agree."""

import pytest

from comm_detect_spark.functions.url import normalize_url_col, normalize_url_py

CASES = [
    ("https://Site0.Example/p/1", "https://site0.example/p/1"),
    ("https://site0.example:443/p/1", "https://site0.example/p/1"),
    ("http://site0.example:80/a//b///c/", "http://site0.example/a/b/c"),
    ("http://site0.example:8080/x", "http://site0.example:8080/x"),
    ("https://site.example/p/2#frag", "https://site.example/p/2"),
    ("https://site.example/p?q=1&r=2#x", "https://site.example/p?q=1&r=2"),
    ("https://site.example", "https://site.example/"),
    ("HTTPS://site.example/", "https://site.example/"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_scalar(raw, want):
    assert normalize_url_py(raw) == want


def test_column_matches_scalar(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url STRING")
    got = [r[0] for r in df.select(normalize_url_col("url")).collect()]
    want = [normalize_url_py(r) for r, _ in CASES]
    assert got == want
