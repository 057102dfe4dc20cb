"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The BASELINE.json target metric is edges-processed/sec per iteration for
PageRank + LPA; those run over the deterministic RMAT bench graph
(FIXTURES.md §3.6, PCG64 seed=42 — no external data), reported under
"throughput". Scaling evidence (local[8] vs local[32]) lives in
scripts/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_rmat_edges(spark, scale: int, edge_factor: int):
    """Deterministic RMAT edge DataFrame (directed) + symmetrized variant."""
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
    sym = (
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
    return n, directed, sym


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rmat_scale = int(os.environ.get("SPARK_GRAFT_RMAT_SCALE", "18"))
    rmat_ef = int(os.environ.get("SPARK_GRAFT_RMAT_EF", "8"))
    pr_iters = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "10"))
    lpa_sweeps = int(os.environ.get("SPARK_GRAFT_LPA_SWEEPS", "4"))

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
    from comm_detect_spark.operators.lpa import lpa_sync
    from comm_detect_spark.operators.pagerank import pagerank
    from comm_detect_spark.plans.driver import IterationDriver

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        return out

    # --- iterative graph kernels over the RMAT bench graph ---------------
    n, directed, sym = build_rmat_edges(spark, rmat_scale, rmat_ef)
    directed = directed.persist()
    m_directed = directed.count()
    sym = sym.persist()
    m_sym = sym.count()

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

    pr_eps = m_directed * pr_iters / timings["pagerank_rmat"]
    lpa_eps = m_sym * lpa_sweeps / timings["lpa_sync_rmat"]

    # --- headline queries over the sf tables ------------------------------
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
    ]
    for name in bench_queries:
        timed(name, lambda name=name: queries[name](spark, sf_dir).count())

    # full Louvain in oracle-parity mode (num_blocks=1) is a single-task
    # kernel by construction — sf0.01 exercises the whole recursion at a
    # cost that keeps the bench loop tight (the per-round brief's call)
    lv_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")) or ".", "sf0.01")
    if not os.path.isdir(lv_dir):
        lv_dir = sf_dir
    timed(
        "louvain_communities",
        lambda: queries["louvain_communities"](spark, lv_dir).count(),
    )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "edges_per_sec_per_iteration(pagerank+lpa)",
        "value": round((pr_eps + lpa_eps) / 2.0, 1),
        "unit": "edges/sec",
        "queries": timings,
        "sf": sf,
        "total_sec": total,
        "throughput": {
            "pagerank_edges_per_sec_per_iter": round(pr_eps, 1),
            "lpa_edges_per_sec_per_iter": round(lpa_eps, 1),
            "rmat_directed_edges": int(m_directed),
            "rmat_sym_entries": int(m_sym),
            "rmat_vertices": int(n),
            "pr_iters": pr_iters,
            "lpa_sweeps": lpa_sweeps,
            "cpus": cpus,
            "louvain_sf_dir": lv_dir,
        },
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
