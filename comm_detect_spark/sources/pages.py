"""The north-rule input table: Common-Crawl-style ``pages`` (FIXTURES.md §1)
and the pages -> (vertices, edges) extraction pipeline (SURVEY Table C).

``generate_pages`` plants a link graph into deterministic HTML; the ``text``
column is produced by the SAME extractor the pipeline uses, making
byte-identity per url an invariant the tests verify through Spark.

``pages_to_graph`` is the production path: scan -> Arrow-UDF link extraction
-> explode -> dedupe -> deterministic vid minting -> edges. At 10^12 pages
the only shuffles are the distinct() and the two vid joins; the parse is a
pure map stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.functions.html import extract_text_py, links_udf
from comm_detect_spark.graph.core import mint_vertex_ids

PAGES_SCHEMA = (
    "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"
)

_LANGS = ["en", "de", "el", "fr"]
_WORDS = (
    "graph link page crawl web rank community cluster edge vertex "
    "spark shuffle partition parquet iceberg arrow batch kernel "
    "modularity propagation triangle component louvain label"
).split()


def page_url(i: int, n_sites: int = 10) -> str:
    return f"https://site{i % n_sites}.example/p/{i}"


def _page_html(i: int, out_links: list[int], n_sites: int) -> bytes:
    """Deterministic page body; ~1/3 of same-site links are site-relative
    to exercise href resolution."""
    words = [_WORDS[(i * 7 + k * 13) % len(_WORDS)] for k in range(12)]
    para = f"Page {i} on site {i % n_sites}. " + " ".join(words) + "."
    anchors = []
    for j, dst in enumerate(out_links):
        if dst % n_sites == i % n_sites and j % 3 == 0:
            href = f"/p/{dst}"  # site-relative
        else:
            href = page_url(dst, n_sites)
        anchors.append(f'<a href="{href}">link {dst}</a>')
    html = (
        f"<html><head><title>p{i}</title>"
        f"<script>var x = {i};</script></head>"
        f"<body><p>{para}</p>\n" + "\n".join(anchors) + "</body></html>"
    )
    return html.encode("utf-8")


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    edges_src: np.ndarray,
    edges_dst: np.ndarray,
    n_sites: int = 10,
) -> DataFrame:
    """Plant (edges_src -> edges_dst) into HTML pages. text = extractor(html)
    by construction (the byte-identity oracle)."""
    out: dict[int, list[int]] = {i: [] for i in range(n_pages)}
    for s, d in zip(np.asarray(edges_src), np.asarray(edges_dst)):
        out[int(s)].append(int(d))
    base_ts = pd.Timestamp("2025-01-01T00:00:00Z").tz_convert(None)
    rows = []
    for i in range(n_pages):
        html = _page_html(i, out[i], n_sites)
        rows.append(
            (
                page_url(i, n_sites),
                base_ts + pd.Timedelta(seconds=i),
                html,
                extract_text_py(html),
                _LANGS[i % len(_LANGS)],
            )
        )
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)


def generate_pages_distributed(
    spark: SparkSession,
    n_pages: int,
    edges: DataFrame,
    n_sites: int = 10,
) -> DataFrame:
    """Executor-side twin of :func:`generate_pages` — same deterministic
    (url, warc_ts, html, text, lang) rows for the same edge set, but built
    as ONE groupBy (out-link adjacency, map-side combined) + a left join
    onto ``spark.range(n_pages)`` + one mapInPandas render, so a 10^9-page
    synthetic corpus never materializes on the driver (the driver twin
    builds every row in a Python list — fine for oracle fixtures, a
    task-serialization wall at scale).

    ``edges``: (src, dst) planted links, vids in [0, n_pages). Out-links
    are rendered in sorted-dst order; feed :func:`generate_pages` edges
    pre-sorted by (src, dst) and the two generators are byte-identical
    per url (pinned in tests/test_sources.py).
    """
    adj = edges.groupBy(F.col("src").cast("bigint").alias("src")).agg(
        F.sort_array(F.collect_list(F.col("dst").cast("bigint"))).alias(
            "dsts"
        )
    )
    full = (
        spark.range(n_pages)
        .select(F.col("id").cast("bigint").alias("src"))
        .join(adj, "src", "left")
    )
    ns = n_sites

    def render(batches):
        base_ts = pd.Timestamp("2025-01-01T00:00:00Z").tz_convert(None)
        for pdf in batches:
            rows = []
            for i, dsts in zip(pdf["src"], pdf["dsts"]):
                i = int(i)
                out = [] if dsts is None else [int(d) for d in dsts]
                html = _page_html(i, out, ns)
                rows.append(
                    (
                        page_url(i, ns),
                        base_ts + pd.Timedelta(seconds=i),
                        html,
                        extract_text_py(html),
                        _LANGS[i % len(_LANGS)],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return full.mapInPandas(render, PAGES_SCHEMA)


def extract_edges(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) from the html column — Arrow-batched parse,
    explode, dedupe. Self-links dropped."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(links_udf(F.col("html"), F.col("url"))).alias("dst_url"),
        )
        .where(F.col("src_url") != F.col("dst_url"))
        .dropDuplicates(["src_url", "dst_url"])
    )


def pages_to_graph(
    pages: DataFrame,
    symmetric: bool = False,
    url_edges: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full extraction: returns (vertices(url, vid), edges(src, dst, weight)).

    Vertices cover every url seen as a page OR link target (deterministic
    dense ids via sorted row_number — never monotonically_increasing_id).
    ``symmetric=True`` materializes both directions (undirected algorithms;
    reference convention graph.cc:31-51).

    ``url_edges``: a pre-extracted (src_url, dst_url) frame — pass the
    staged output of :func:`extract_edges` when several consumers (vid
    graph, host rollup) share one corpus so the html parse runs ONCE;
    default re-extracts from ``pages``."""
    raw = extract_edges(pages) if url_edges is None else url_edges
    urls = (
        pages.select(F.col("url"))
        .union(raw.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    vertices = mint_vertex_ids(urls).persist()
    vertices.count()
    edges = (
        raw.join(vertices.withColumnRenamed("url", "src_url"), "src_url")
        .withColumnRenamed("vid", "src")
        .join(
            vertices.select(
                F.col("url").alias("dst_url"), F.col("vid").alias("dst")
            ),
            "dst_url",
        )
        .select("src", "dst", F.lit(1).cast("bigint").alias("weight"))
    )
    if symmetric:
        edges = (
            edges.select("src", "dst", "weight")
            .union(
                edges.select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    "weight",
                )
            )
            .dropDuplicates(["src", "dst"])
        )
    return vertices, edges
