"""Louvain multi-block crossover measurement (round-5 task #5).

At sf0.01 the SCALE mode (num_blocks = P: cogrouped Arrow-CSR kernel,
frontier, freeze machine) costs ~1.7x the parity mode (num_blocks=1: the
whole graph as ONE Python task) — block overhead dominates a tiny graph.
This script measures BOTH modes on the same deterministic RMAT graph at a
size where the parallel decomposition should win, so the scale path's
advantage — not just its small-graph overhead — is on record
(PERFORMANCE.md / BENCH/BASELINE.md).

Protocol: interleaved reps (never the same mode back-to-back), median +
min per mode, numpy hardware anchor per rep (same probe as bench.py).
num_blocks is output-changing (Jacobi block structure), so the two modes
are different — equally valid — partitions; this is a throughput
comparison, not a parity check (parity is pinned elsewhere).

Usage: python scripts/louvain_crossover.py [--scale 19] [--ef 12]
           [--cpus 32] [--reps 2] [--max-sweeps 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=19)
    ap.add_argument("--ef", type=int, default=12)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--max-sweeps", type=int, default=8)
    ap.add_argument("--max-levels", type=int, default=1)
    args = ap.parse_args()

    from bench import build_rmat_edges, hw_anchor
    from comm_detect_spark.operators.louvain import louvain
    from comm_detect_spark.session import get_spark

    spark = get_spark(
        app_name="louvain-crossover",
        cores=args.cpus,
        shuffle_partitions=args.cpus,
    )
    n, _, sym = build_rmat_edges(spark, args.scale, args.ef)
    sym = sym.persist()
    m_sym = sym.count()

    runs: dict[str, list[float]] = {"parity": [], "scale": []}
    anchors = []
    for _ in range(args.reps):
        anchors.append(round(hw_anchor(), 2))
        for mode, blocks in (("parity", 1), ("scale", args.cpus)):
            t0 = time.perf_counter()
            out, sweeps = louvain(
                spark,
                sym,
                n,
                num_blocks=blocks,
                frontier=(blocks > 1),
                max_levels=args.max_levels,
                max_sweeps=args.max_sweeps,
            )
            out.count()
            runs[mode].append(round(time.perf_counter() - t0, 3))

    med = {k: statistics.median(v) for k, v in runs.items()}
    print(
        json.dumps(
            {
                "what": "louvain parity (num_blocks=1) vs scale "
                "(num_blocks=P) on the same RMAT graph",
                "scale": args.scale,
                "ef": args.ef,
                "vertices": int(n),
                "sym_entries": int(m_sym),
                "cpus": args.cpus,
                "max_sweeps": args.max_sweeps,
                "max_levels": args.max_levels,
                "reps": args.reps,
                "runs": runs,
                "median": {k: round(v, 3) for k, v in med.items()},
                "min": {k: round(min(v), 3) for k, v in runs.items()},
                "speedup_scale_over_parity_median": round(
                    med["parity"] / med["scale"], 3
                ),
                "speedup_scale_over_parity_min": round(
                    min(runs["parity"]) / min(runs["scale"]), 3
                ),
                "hw_anchor_units_per_sec": anchors,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
