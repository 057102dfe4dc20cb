"""Scaling-efficiency evidence (north rule: >=0.8 going N -> 4N executors).

No real cluster exists in this sandbox, so per the BENCH/BASELINE.md
protocol we run the SAME job on the SAME input at two parallelism levels —
local[8] (N) and local[32] (4N) — and report throughput at both plus
efficiency = (throughput@32 / throughput@8) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [--scale 18] [--ef 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_at(cores: int, scale: int, ef: int, pr_iters: int, lpa_sweeps: int):
    from comm_detect_spark.operators.lpa import lpa_sync
    from comm_detect_spark.operators.pagerank import pagerank
    from comm_detect_spark.session import get_spark

    from bench import build_rmat_edges

    spark = get_spark(
        app_name=f"scaling-bench-{cores}", cores=cores,
        shuffle_partitions=2 * cores,
    )
    n, directed, sym = build_rmat_edges(spark, scale, ef)
    directed = directed.persist()
    m_dir = directed.count()
    sym = sym.persist()
    m_sym = sym.count()

    t0 = time.perf_counter()
    pagerank(spark, directed, n, iterations=pr_iters).count()
    t_pr = time.perf_counter() - t0

    t0 = time.perf_counter()
    lpa_sync(spark, sym, n, eps=-1.0, max_iter=lpa_sweeps).count()
    t_lpa = time.perf_counter() - t0

    spark.stop()
    return {
        "cores": cores,
        "pagerank_sec": round(t_pr, 3),
        "lpa_sec": round(t_lpa, 3),
        "pr_eps": round(m_dir * pr_iters / t_pr, 1),
        "lpa_eps": round(m_sym * lpa_sweeps / t_lpa, 1),
        "edges_directed": int(m_dir),
        "edges_sym": int(m_sym),
        "vertices": int(n),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--ef", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    low = run_at(args.low, args.scale, args.ef, args.iters, args.sweeps)
    high = run_at(args.high, args.scale, args.ef, args.iters, args.sweeps)

    factor = args.high / args.low
    eff_pr = (high["pr_eps"] / low["pr_eps"]) / factor
    eff_lpa = (high["lpa_eps"] / low["lpa_eps"]) / factor
    result = {
        "low": low,
        "high": high,
        "scaling_factor": factor,
        "efficiency_pagerank": round(eff_pr, 3),
        "efficiency_lpa": round(eff_lpa, 3),
        "efficiency_mean": round((eff_pr + eff_lpa) / 2, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            f"""# BENCH — throughput & scaling evidence

Protocol (BASELINE.md): identical code + input (RMAT scale={args.scale},
edge_factor={args.ef}, PCG64 seed=42) at local[{args.low}] (N) and
local[{args.high}] (4N); efficiency = (throughput@{args.high} /
throughput@{args.low}) / {factor:.0f}.

| config | PageRank {args.iters} iters | LPA {args.sweeps} sweeps | PR edges/s/iter | LPA edges/s/iter |
|---|---|---|---|---|
| local[{args.low}] | {low['pagerank_sec']} s | {low['lpa_sec']} s | {low['pr_eps']:,.0f} | {low['lpa_eps']:,.0f} |
| local[{args.high}] | {high['pagerank_sec']} s | {high['lpa_sec']} s | {high['pr_eps']:,.0f} | {high['lpa_eps']:,.0f} |

Graph: {low['vertices']:,} vertices, {low['edges_directed']:,} directed edges,
{low['edges_sym']:,} symmetric adjacency entries.

**Scaling efficiency N->4N:** PageRank {eff_pr:.3f}, LPA {eff_lpa:.3f}
(mean {result['efficiency_mean']:.3f}; target >= 0.8).

Reference baseline (BASELINE.md): PLP on uk-2002, 1->8 threads 7.65x
(efficiency 0.96); our in-sandbox stand-in measures the same strong-scaling
shape on the Spark engine.
"""
        )


if __name__ == "__main__":
    main()
