"""HTML text + link extraction (SURVEY Table C, north-rule input_hint).

The scalar extractors are THE text oracle: the fixture generator writes
``pages.text = extract_text_py(pages.html)`` so byte-identity per url is an
invariant of the pipeline, and the pytest gate re-checks it through the
Spark surface (sha256 equality per url).

Spark side: Arrow-batched pandas UDFs (``pandas_udf``) — one Python
invocation per Arrow batch, never per row (input_hint: "no per-row
Python"). HTML parsing itself is per-document stdlib work inside the batch;
at 10^12-doc scale this is the embarrassingly-parallel map stage — no
shuffle, scales linearly with executors, bounded memory per batch via
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_SKIP_TAGS = {"script", "style", "noscript", "template"}


class _TextCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0 and data.strip():
            self._chunks.append(data)


class _LinkCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value:
                    self.hrefs.append(value)


def extract_text_py(html: bytes | str) -> str:
    """Deterministic text extraction: visible text nodes (script/style
    skipped), whitespace-collapsed, single-space joined."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TextCollector()
    p.feed(html)
    p.close()
    return " ".join(" ".join(p._chunks).split())


def extract_links_py(html: bytes | str, base_url: str) -> list[str]:
    """All <a href> targets in document order, resolved against base_url,
    fragments dropped, deduped preserving first occurrence."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _LinkCollector()
    p.feed(html)
    p.close()
    seen, out = set(), []
    for href in p.hrefs:
        absu = urljoin(base_url, href).split("#", 1)[0]
        if absu and absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


@F.pandas_udf(StringType())
def text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


@F.pandas_udf(ArrayType(StringType()))
def links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links_py(h, u) for h, u in zip(html, url)]
    )
