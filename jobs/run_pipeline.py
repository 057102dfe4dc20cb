"""spark-submit entry point for the END-TO-END web-corpus pipeline — the
composition the 68 driver queries exercise piecewise, as one job:

    pages parquet -> link extraction -> page graph
        -> host rollup + host pagerank          (the domain spine)
        -> page pagerank                        (ranking signal)
        -> louvain communities                  (cluster signal)
        -> quality gate -> dedup keep-list      (corpus hygiene)
        -> train/val split -> token shards      (training layout)

    # run on an existing Common-Crawl-style pages table
    # (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING):
    spark-submit --py-files comm_detect_spark.zip jobs/run_pipeline.py \
        --pages /data/pages.parquet --out /data/pipeline

    # or synthesize a deterministic RMAT-planted corpus executor-side
    # (no external data; 2^scale pages):
    ... --generate-scale 14 --out /tmp/pipeline

Every stage is timed and written under --out/<stage>/; the job's last
stdout line is one JSON object {"stages": {name: sec}, "rows": {name: n},
"total_sec": ...} so a scheduler can scrape per-stage cost.

100 TB shape: each stage is the library operator it names — extraction is
one Arrow-UDF map + distinct, host rollup one agg, pagerank/louvain the
plan-asserted one-exchange-per-round iterators, the corpus tail bucketed
dedup + pure-column split + two-phase-prefix shards. The only driver-side
materialization anywhere is this script's per-stage row counts.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_pipeline(
    spark: SparkSession,
    pages,
    out: str,
    iterations: int = 5,
    num_blocks: int | None = None,
    splits=(("train", 0.9), ("val", 0.1)),
    shard_tokens: int = 100_000,
    seed: int = 42,
    quality_kwargs: dict | None = None,
) -> dict:
    """Run every stage over a pages DataFrame; returns the timing report.

    Kept importable (tests call it in-process on a 60-page fixture) —
    main() only parses args and builds the session.
    """
    from comm_detect_spark.operators.corpus import (
        corpus_keep_list,
        hash_split,
        pack_shards,
        quality_filter,
    )
    from comm_detect_spark.operators.dedup import _h60
    from comm_detect_spark.operators.hostgraph import host_graph
    from comm_detect_spark.operators.louvain import louvain
    from comm_detect_spark.operators.pagerank import pagerank
    from comm_detect_spark.sources.pages import extract_edges, pages_to_graph

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def stage(name, df, order_cols=None):
        t0 = time.perf_counter()
        w = df.orderBy(*order_cols) if order_cols else df
        w.write.mode("overwrite").parquet(f"{out}/{name}")
        back = spark.read.parquet(f"{out}/{name}")
        rows[name] = back.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        return back

    t_all = time.perf_counter()

    # 0. html -> (src_url, dst_url), parsed ONCE and staged — both the vid
    # graph and the host rollup read the staged table, so the expensive
    # Arrow-UDF link extraction is a single pass over the corpus
    url_edges = stage("url_edges", extract_edges(pages),
                      order_cols=["src_url", "dst_url"])

    # 1. page graph: links -> deterministic vids ---------------------------
    t0 = time.perf_counter()
    vertices, edges = pages_to_graph(pages, symmetric=False,
                                     url_edges=url_edges)
    edges = stage("edges", edges)
    vertices.write.mode("overwrite").parquet(f"{out}/vertices")
    vertices = spark.read.parquet(f"{out}/vertices")
    n = rows["vertices"] = vertices.count()
    timings["extract_graph"] = round(time.perf_counter() - t0, 3)

    # 2. host rollup + host pagerank --------------------------------------
    t0 = time.perf_counter()
    he = host_graph(url_edges)
    hosts = (
        he.select(F.col("src_host").alias("host"))
        .unionAll(he.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    hid = hosts.select("host", _h60(F.col("host")).alias("vid"))
    h_edges = (
        he.join(
            hid.withColumnRenamed("host", "src_host").withColumnRenamed(
                "vid", "src"
            ),
            "src_host",
        )
        .join(
            hid.withColumnRenamed("host", "dst_host").withColumnRenamed(
                "vid", "dst"
            ),
            "dst_host",
        )
        .select("src", "dst", "weight")
    )
    h_ranks = pagerank(
        spark, h_edges, vertices=hid.select("vid"), iterations=iterations
    )
    timings["host_graph"] = round(time.perf_counter() - t0, 3)
    stage(
        "host_rank",
        hid.join(h_ranks, "vid").select("host", "rank"),
        order_cols=[F.desc("rank"), F.asc("host")],
    )

    # 3. page pagerank -----------------------------------------------------
    t0 = time.perf_counter()
    ranks = pagerank(
        spark,
        edges,
        vertices=vertices.select("vid"),
        iterations=iterations,
    )
    timings["pagerank_iters"] = round(time.perf_counter() - t0, 3)
    stage(
        "page_rank",
        vertices.join(ranks, "vid").select("url", "rank"),
        order_cols=[F.desc("rank"), F.asc("url")],
    )

    # 4. louvain over the symmetrized page graph ---------------------------
    t0 = time.perf_counter()
    sym = (
        edges.select("src", "dst", "weight")
        .union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .dropDuplicates(["src", "dst"])
    )
    labels, levels = louvain(spark, sym, n, num_blocks=num_blocks)
    timings["louvain_levels"] = levels
    timings["louvain"] = round(time.perf_counter() - t0, 3)
    stage(
        "communities",
        vertices.join(labels, "vid").select("url", "label"),
        order_cols=["label", "url"],
    )

    # 5. corpus tail: quality gate -> dedup -> split -> shards -------------
    docs = pages.select(
        F.col("url").alias("doc_id"), F.col("text")
    )
    qf = stage(
        "quality",
        quality_filter(docs, **(quality_kwargs or {})),
        order_cols=["doc_id"],
    )
    kept = docs.join(qf.where("keep").select("doc_id"), "doc_id")
    keep = stage(
        "keep_list",
        corpus_keep_list(spark, kept),
        order_cols=["id"],
    )
    final = kept.join(
        keep.where(F.col("keep")).select(F.col("id").alias("doc_id")),
        "doc_id",
    )
    stage(
        "split",
        hash_split(final, fractions=tuple(splits), seed=seed),
        order_cols=["doc_id"],
    )
    with_tokens = final.join(
        qf.select("doc_id", "n_tokens"), "doc_id"
    ).select("doc_id", F.col("n_tokens").alias("tokens"))
    stage(
        "shards",
        pack_shards(with_tokens, shard_tokens=shard_tokens, seed=seed),
        order_cols=["shard_id", "id"],
    )

    report = {
        "stages": timings,
        "rows": rows,
        "total_sec": round(time.perf_counter() - t_all, 3),
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages parquet (url, warc_ts, html, "
                                    "text, lang)")
    ap.add_argument("--generate-scale", type=int,
                    help="no input: synthesize 2^scale pages executor-side "
                         "from a distributed RMAT link plant")
    ap.add_argument("--edge-factor", type=int, default=8,
                    help="--generate-scale: planted links per page")
    ap.add_argument("--n-sites", type=int, default=10)
    ap.add_argument("--out", required=True)
    ap.add_argument("--iterations", type=int, default=5,
                    help="pagerank iterations (host and page)")
    ap.add_argument("--num-blocks", type=int, default=None,
                    help="louvain gather blocks (default: shuffle "
                         "partitions)")
    ap.add_argument("--splits", default="train:0.9,val:0.1")
    ap.add_argument("--shard-tokens", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--min-tokens", type=int, default=30)
    ap.add_argument("--min-quality", type=float, default=0.8)
    ap.add_argument("--allowed-langs", default="en",
                    help="comma list; synthetic --generate-scale text "
                         "lang-ids as 'und'")
    args = ap.parse_args()
    if bool(args.pages) == bool(args.generate_scale):
        ap.error("exactly one of --pages / --generate-scale")

    spark = SparkSession.builder.appName("comm-detect-pipeline").getOrCreate()

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        from comm_detect_spark.sources.pages import (
            generate_pages_distributed,
        )
        from comm_detect_spark.sources.rmat import rmat_edges_distributed

        n_pages = 1 << args.generate_scale
        planted = rmat_edges_distributed(
            spark,
            args.generate_scale,
            edge_factor=args.edge_factor,
            seed=args.seed,
        ).where(F.col("src") != F.col("dst"))
        pages = generate_pages_distributed(
            spark, n_pages, planted, n_sites=args.n_sites
        )
        # the render UDF re-runs per downstream stage otherwise — at
        # cluster scale this would be a written staging table instead
        pages.write.mode("overwrite").parquet(f"{args.out}/pages")
        pages = spark.read.parquet(f"{args.out}/pages")

    splits = tuple(
        (p.split(":")[0], float(p.split(":")[1]))
        for p in args.splits.split(",")
    )
    report = run_pipeline(
        spark,
        pages,
        args.out,
        iterations=args.iterations,
        num_blocks=args.num_blocks,
        splits=splits,
        shard_tokens=args.shard_tokens,
        seed=args.seed,
        quality_kwargs={
            "min_tokens": args.min_tokens,
            "min_quality": args.min_quality,
            "allowed_langs": tuple(args.allowed_langs.split(",")),
        },
    )
    print(json.dumps(report, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
