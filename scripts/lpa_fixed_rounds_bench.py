"""A/B/C measurement for the fixed-rounds LPA fast path (r6).

A = counting loop (pre-change lpa_sync: per-sweep changed-label join+count
    fills the cache — pass --old-lpa pointing at a copy of the old module),
B = fixed-rounds step() path (skips the count job; cache fill is a plain
    count of the new state),
C = B + materialize_every=3 (3 sweeps chained into one job; relies on
    ReusedExchange to keep the doubled state reference linear).

Interleaved reps with a numpy hardware anchor per rep, medians printed as
one JSON line. Run in a quiet window; local[8] by default.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def hw_anchor() -> float:
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.random(2_000_000)
    t0 = time.perf_counter()
    for _ in range(6):
        np.sort(x)
    return round(6 / (time.perf_counter() - t0) * 10, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--edge-factor", type=int, default=12)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--old-lpa", default=None,
                    help="path to a pre-change lpa.py for the A leg "
                         "(omit to skip A)")
    args = ap.parse_args()

    from bench import build_rmat_edges
    from comm_detect_spark.operators.lpa import lpa_sync
    from comm_detect_spark.plans.driver import IterationDriver
    from comm_detect_spark.session import get_spark

    old = None
    if args.old_lpa:
        spec = importlib.util.spec_from_file_location("old_lpa", args.old_lpa)
        old = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(old)

    spark = get_spark(cores=args.cores, shuffle_partitions=args.cores)
    n, _directed, sym = build_rmat_edges(spark, args.scale, args.edge_factor)
    sym = sym.persist()
    m = sym.count()

    legs = {}
    if old is not None:
        legs["A_counting"] = lambda: old.lpa_sync(
            spark, sym, n, eps=-1.0, max_iter=args.sweeps,
            driver=IterationDriver(checkpoint_every=3),
        ).count()
    legs["B_step"] = lambda: lpa_sync(
        spark, sym, n, eps=-1.0, max_iter=args.sweeps,
        driver=IterationDriver(checkpoint_every=3),
    ).count()
    legs["C_chain3"] = lambda: lpa_sync(
        spark, sym, n, eps=-1.0, max_iter=args.sweeps,
        driver=IterationDriver(checkpoint_every=3, materialize_every=3),
    ).count()

    runs: dict[str, list[float]] = {k: [] for k in legs}
    anchors = []
    for _ in range(args.reps):
        anchors.append(hw_anchor())
        for name, fn in legs.items():
            t0 = time.perf_counter()
            fn()
            runs[name].append(round(time.perf_counter() - t0, 3))
    med = {k: statistics.median(v) for k, v in runs.items()}
    print(json.dumps({
        "scale": args.scale, "cores": args.cores, "sweeps": args.sweeps,
        "edges_sym": m, "median_sec": med, "runs": runs,
        "anchors": anchors,
        "lpa_eps": {k: round(m * args.sweeps / v, 1)
                    for k, v in med.items()},
    }, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
