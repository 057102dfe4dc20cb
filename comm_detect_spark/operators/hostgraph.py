"""Host-level link-graph rollup — the "domain graph" of a web crawl.

No reference twin (SURVEY §2 is community detection on abstract graphs);
this is the standard Common-Crawl-style product derived from the
page-level link graph: collapse every page URL to its registered host and
aggregate link multiplicities, yielding a graph 3-5 orders of magnitude
smaller that the whole analytics stack (PageRank, CC, Louvain, SSSP, ...)
then runs on cheaply. Spam/SEO analysis, crawl prioritization, and
per-domain dataset curation all operate at this granularity.

Plan shape: host extraction is ONE regexp per side on the scan (pure
codegen — no URL parsing library, no Python), the rollup is one
map-side-combined groupBy(src_host, dst_host). At 10^12 edges the combine
does the heavy lifting: pages of one host live near each other in crawl
order, so map-side partial aggregation collapses most duplicates before
the exchange, and the shuffled pair table is domain-graph-sized (10^7-8
rows), not page-graph-sized. The per-host profile is a second small agg
over the rolled-up table. Host keys stay STRINGS end-to-end — renumbering
to dense vids (graph/core.py) is the consumer's one extra join; keeping
the natural key makes the rollup itself engine-replayable and auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host = authority of scheme://authority/..., ports stripped, lowercased.
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)"


def host_of(col: str | Column) -> Column:
    """Lowercased hostname of an absolute URL column (port / path / query
    dropped); '' for non-URL strings. One regexp_extract — codegen."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def host_graph(
    url_edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """(src_host, dst_host, weight): page-level URL edges rolled up to
    host pairs, weight = number of page links (self-loops kept — the
    intra-host fraction is a signal, not noise). Edges whose either side
    has no extractable host are dropped (stated, not hidden)."""
    e = url_edges.select(
        host_of(src_col).alias("src_host"),
        host_of(dst_col).alias("dst_host"),
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )


def host_profile(host_edges: DataFrame) -> DataFrame:
    """Per-host audit row over a host_graph() table:

      (host, out_links, in_links, out_hosts, in_hosts, self_links,
       intra_frac)

    out/in_links are link multiplicities (weights), out/in_hosts distinct
    neighbor hosts, self_links the host's own self-loop weight, intra_frac
    = self_links / (out_links) rounded 6 (NULL when the host has no
    out-links). Two map-side-combined aggs over the (already small)
    host-pair table + one full outer join on host."""
    outs = host_edges.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("weight").alias("out_links"),
        F.countDistinct("dst_host").alias("out_hosts"),
        F.sum(
            F.when(
                F.col("src_host") == F.col("dst_host"), F.col("weight")
            ).otherwise(F.lit(0))
        ).alias("self_links"),
    )
    ins = host_edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.sum("weight").alias("in_links"),
        F.countDistinct("src_host").alias("in_hosts"),
    )
    self0 = F.coalesce("self_links", F.lit(0))
    # intra_frac built from the PRE-alias columns: in a single select list
    # Spark lateral-resolves `self_links`/`out_links` to the new coalesced
    # aliases (the node2vec lesson, walks.py) — write the expressions out
    return (
        outs.join(ins, "host", "full")
        .select(
            "host",
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
            F.coalesce("out_hosts", F.lit(0)).alias("out_hosts"),
            F.coalesce("in_hosts", F.lit(0)).alias("in_hosts"),
            self0.alias("self_links"),
            F.round(
                self0 / F.nullif(F.col("out_links").cast("double"),
                                 F.lit(0.0)),
                6,
            ).alias("intra_frac"),
        )
    )
