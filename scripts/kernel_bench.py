"""Sweep-kernel microbench: oracle (per-node Python) vs fast execution
kernels (kernels.py) on the deterministic RMAT bench graph. No Spark — this
isolates exactly the code that runs inside each applyInPandas block.

Prints one JSON line; numbers land in PERFORMANCE.md.

Usage: python scripts/kernel_bench.py [--scale 19] [--ef 12] [--oracle-frac 0.25]

``--oracle-frac``: the oracle kernel is run on a prefix fraction of the
nodes and extrapolated (it is linear in nodes swept) so the bench stays
minutes, not hours, at scale 19+. The FAST kernel always sweeps everything.
Parity itself is pinned in tests/test_kernels.py; this script only times.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np


def _user() -> float:
    """User CPU seconds — the honest per-core metric on this host: the
    sandbox's fault path intermittently adds seconds of SYSTEM time to
    identical allocations (measured: same sweep 1.6 s vs 6.3 s wall with
    user time stable at 1.5 s), so wall medians conflate engine work with
    host memory-subsystem flaps."""
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from comm_detect_spark.operators.kernels import (  # noqa: E402
    local_move_sweep_fast,
    lpa_async_sweep_fast,
)
from comm_detect_spark.oracle.algorithms import (  # noqa: E402
    Adjacency,
    local_move_sweep,
    lpa_async_sweep,
    volumes,
)
from comm_detect_spark.oracle.graphs import rmat_edges  # noqa: E402


def build_sym_adjacency(scale: int, ef: int) -> Adjacency:
    n, src, dst, w = rmat_edges(scale=scale, edge_factor=ef)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    key = s * n + d
    uniq, inv = np.unique(key, return_inverse=True)
    w2 = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(w2, inv, ww)
    return Adjacency.from_entries(n, uniq // n, uniq % n, w2)


def main():
    import statistics

    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=19)
    ap.add_argument("--ef", type=int, default=12)
    ap.add_argument("--oracle-frac", type=float, default=0.25)
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved repetitions, medians reported "
                         "(the host CPU grant is bursty)")
    ap.add_argument("--lm-sweeps", type=int, default=4,
                    help="total local-move sweeps timed (1 + tail)")
    args = ap.parse_args()

    adj = build_sym_adjacency(args.scale, args.ef)
    n = adj.n
    m_oracle = max(int(n * args.oracle_frac), 1)
    entries = int(adj.indptr[-1])
    vol = volumes(adj)
    w_net = adj.weight_net

    o_lpa, f_lpa, o_lm, f_lm, f_lm_tail = [], [], [], [], []
    for _ in range(args.reps):
        lab = np.arange(n, dtype=np.int64)
        t0 = _user()
        lpa_async_sweep(adj, lab, nodes=np.arange(m_oracle, dtype=np.int64))
        o_lpa.append((_user() - t0) / args.oracle_frac)

        lab = np.arange(n, dtype=np.int64)
        t0 = _user()
        lpa_async_sweep_fast(adj, lab)
        f_lpa.append(_user() - t0)

        # multi-sweep: sweep 1 (all-singleton) and the coalesced regime
        # (sweeps 2+) stress different kernel paths — time both
        lab = np.arange(n, dtype=np.int64)
        cv = vol.copy()
        t0 = _user()
        local_move_sweep(adj, lab, vol, cv, w_net,
                         nodes=np.arange(m_oracle, dtype=np.int64))
        o_lm.append((_user() - t0) / args.oracle_frac)

        lab = np.arange(n, dtype=np.int64)
        cv = vol.copy()
        t0 = _user()
        local_move_sweep_fast(adj, lab, vol, cv, w_net)
        f_lm.append(_user() - t0)
        # the coalesced regime (sweeps 2+) exercises a different kernel
        # balance than the all-singleton sweep 1 — report it separately
        t0 = _user()
        for _s in range(args.lm_sweeps - 1):
            local_move_sweep_fast(adj, lab, vol, cv, w_net)
        f_lm_tail.append((_user() - t0) / max(args.lm_sweeps - 1, 1))

    t_oracle_lpa = statistics.median(o_lpa)
    t_fast_lpa = statistics.median(f_lpa)
    t_oracle_lm = statistics.median(o_lm)
    t_fast_lm = statistics.median(f_lm)
    t_fast_lm_tail = statistics.median(f_lm_tail)

    print(json.dumps({
        "scale": args.scale,
        "vertices": n,
        "adjacency_entries": entries,
        "oracle_frac": args.oracle_frac,
        "reps": args.reps,
        "lpa_sweep_sec": {"oracle_extrapolated": round(t_oracle_lpa, 2),
                          "fast": round(t_fast_lpa, 2),
                          "speedup": round(t_oracle_lpa / t_fast_lpa, 1)},
        "local_move_sweep_sec": {"oracle_extrapolated": round(t_oracle_lm, 2),
                                 "fast": round(t_fast_lm, 2),
                                 "fast_tail_sweeps": round(t_fast_lm_tail, 2),
                                 "speedup": round(t_oracle_lm / t_fast_lm, 1)},
        "timer": "user_cpu_sec",
    }))


if __name__ == "__main__":
    main()
