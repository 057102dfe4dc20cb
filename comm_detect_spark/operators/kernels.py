"""Fast execution kernels for the asynchronous (Gauss-Seidel) sweeps.

The NumPy oracle kernels (oracle/algorithms.py: lpa_async_sweep,
local_move_sweep) ARE the semantics — deterministic sequential reductions of
the reference's racy parallel sweeps (plp.cc:96-104, plm.cc:296-314). But as
execution kernels they dispatch ~10 µs of Python per vertex, which is a
scale-killer at 10^9 vertices/sweep. This module holds drop-in replacements
with identical output (pinned by tests/test_kernels.py, element-exact):

* ``lpa_async_sweep_fast`` — RUN DECOMPOSITION. Split the ascending sweep
  order into maximal runs [a, b) of consecutive node ids containing no
  intra-run edge. Within such a run, no member reads another member's label,
  so a vectorized (Jacobi) update of the whole run is EQUAL to the
  sequential Gauss-Seidel update — not an approximation. Each run is one
  numpy grouped argmax (the oracle's exact tie-break: max weight, lowest
  label). Expected run length on a hashed-id graph of avg degree d is
  ~sqrt(2n/d), so Python dispatch drops by orders of magnitude.
  (numba would be the compiled alternative; it is not available in this
  environment, and the run decomposition is pure numpy + exact.)

* ``local_move_sweep_fast`` — Louvain's local move mutates GLOBAL community
  volumes on every move, so a run decomposition would need candidate-
  community disjointness, which almost never holds. Instead: the same
  per-node loop with the numpy small-array dispatch (argsort/reduceat/
  searchsorted per node) replaced by plain-Python dict aggregation over
  pre-converted lists — bit-exact float64 op order preserved.

Reference for semantics: plp.cc:22-69 (dominant label), plm.cc:192-242
(ReturnCommunity dQ), with the repo-wide lowest-label tie pin (SURVEY §5.2).
"""

from __future__ import annotations

import numpy as np

from comm_detect_spark.oracle.algorithms import Adjacency


def _prev_member_neighbor(adj: Adjacency, m: int) -> np.ndarray:
    """prev[v] = largest neighbor id < v (or -1), for v in [0, m).
    Vectorized over the CSR (per-row indices are sorted ascending —
    Adjacency.from_entries lexsorts by (src, dst))."""
    hi = int(adj.indptr[m])
    src_rep = np.repeat(np.arange(m, dtype=np.int64), np.diff(adj.indptr[: m + 1]))
    nbr = adj.indices[:hi]
    mask = nbr < src_rep
    cs = np.concatenate(([0], np.cumsum(mask)))
    row_lo = adj.indptr[:m]
    cnt = cs[adj.indptr[1 : m + 1]] - cs[row_lo]
    prev = np.full(m, -1, dtype=np.int64)
    has = cnt > 0
    prev[has] = adj.indices[row_lo[has] + cnt[has] - 1]
    return prev


def lpa_async_sweep_fast(adj: Adjacency, labels: np.ndarray, m: int | None = None) -> int:
    """One asynchronous LPA sweep IN PLACE over nodes [0, m) in ascending
    order. Output identical to oracle.lpa_async_sweep(adj, labels,
    nodes=arange(m)) — see the run-decomposition proof in the module
    docstring. Returns #updated."""
    if m is None:
        m = adj.n
    if m == 0:
        return 0
    prev = _prev_member_neighbor(adj, m)
    indptr, indices, weights = adj.indptr, adj.indices, adj.weights
    updated = 0
    a = 0
    prev_l = prev.tolist()
    while a < m:
        b = a + 1
        while b < m and prev_l[b] < a:
            b += 1
        lo, hi = int(indptr[a]), int(indptr[b])
        if hi > lo:
            src = np.repeat(
                np.arange(a, b, dtype=np.int64), np.diff(indptr[a : b + 1])
            )
            cand = labels[indices[lo:hi]]
            wt = weights[lo:hi]
            # group by (node, cand): single argsort of a packed key when the
            # label range fits (run-local node index needs few bits); the
            # lexsort fallback covers huge label spaces
            cmin = int(cand.min())
            span = int(cand.max()) - cmin + 1
            if span.bit_length() + (b - a).bit_length() <= 62:
                # stability is irrelevant: key ties are same (node, cand),
                # and the group sum is order-independent (integer weights)
                packed = (src - a) * span + (cand - cmin)
                order = np.argsort(packed)
            else:
                order = np.lexsort((cand, src))
            s, l, w = src[order], cand[order], wt[order]
            boundary = np.empty(s.size, dtype=bool)
            boundary[0] = True
            boundary[1:] = (s[1:] != s[:-1]) | (l[1:] != l[:-1])
            starts = np.flatnonzero(boundary)
            sums = np.add.reduceat(w, starts)
            g_node, g_label = s[starts], l[starts]
            # per-node argmax WITHOUT a second sort: groups are ordered by
            # (node, label asc); winner = first group of the node hitting
            # the node's max sum -> max weight, tie -> lowest label (pin)
            nfirst = np.empty(g_node.size, dtype=bool)
            nfirst[0] = True
            nfirst[1:] = g_node[1:] != g_node[:-1]
            nstarts = np.flatnonzero(nfirst)
            nmax = np.maximum.reduceat(sums, nstarts)
            counts = np.diff(np.append(nstarts, g_node.size))
            is_max = sums == np.repeat(nmax, counts)
            hits = np.flatnonzero(is_max)
            hn = g_node[hits]
            hfirst = np.empty(hn.size, dtype=bool)
            hfirst[0] = True
            hfirst[1:] = hn[1:] != hn[:-1]
            win = hits[hfirst]
            wn, wl, ws = g_node[win], g_label[win], sums[win]
            adopt = (ws > 0) & (wl != labels[wn])
            labels[wn[adopt]] = wl[adopt]
            updated += int(adopt.sum())
        a = b
    return updated


def movable_mask(nodes: np.ndarray, sweep: int) -> np.ndarray:
    """Deterministic half-freeze mask for symmetry-breaking sweeps
    (louvain._local_move's oscillation breaker): vertex v may move in
    ``sweep`` iff bit 0 of splitmix64(v XOR golden*sweep) is 0. A swap
    cycle survives a sweep only if every member is active; the mask
    re-rolls per sweep, so any pair is split with prob 1/2 per sweep and
    the cycle resolves into a merge. Pure function of (vid, sweep): block
    layout, resume and partitioning cannot change it."""
    salt = np.uint64((0x9E3779B97F4A7C15 * (sweep + 1)) & 0xFFFFFFFFFFFFFFFF)
    x = (nodes.astype(np.uint64) ^ salt).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x & np.uint64(1)) == 0


def local_move_sweep_fast(
    adj: Adjacency,
    labels: np.ndarray,
    vol: np.ndarray,
    comm_vol,
    weight_net: int,
    m: int | None = None,
    movable: np.ndarray | None = None,
) -> int:
    """One asynchronous local-move sweep IN PLACE over nodes [0, m) —
    bit-exact vs oracle.local_move_sweep (same float64 op order, same
    strict dQ > 0 gate, same lowest-label tie), with per-node numpy
    dispatch replaced by Python dict aggregation. ``comm_vol`` is a mutable
    {label: volume} dict or int64 array, updated incrementally per move
    (plm.cc:306-311). ``movable``: optional bool mask over [0, m) — frozen
    vertices keep their label but still count as neighbors (the
    symmetry-breaking sweeps; None == all movable, the oracle semantics).
    Returns #moved."""
    if m is None:
        m = adj.n
    w = float(weight_net)
    inv_2w2 = 1.0 / (2.0 * w * w)
    indptr = adj.indptr.tolist()
    idx = adj.indices.tolist()
    wts = adj.weights.tolist()
    lab = labels.tolist()
    vol_l = vol.tolist()
    # dict view of comm_vol (arrays: index == label); write-through at move
    is_dict = isinstance(comm_vol, dict)
    mov = movable.tolist() if movable is not None else None
    moved = 0
    for i in range(m):
        if mov is not None and not mov[i]:
            continue
        s, e = indptr[i], indptr[i + 1]
        if s == e:
            continue
        agg: dict[int, int] = {}
        for k in range(s, e):
            j = idx[k]
            if j == i:  # self-loops excluded from w_c/w_d (plm.cc:212)
                continue
            lj = lab[j]
            agg[lj] = agg.get(lj, 0) + wts[k]
        if not agg:
            continue
        c = lab[i]
        w_c = float(agg.get(c, 0))
        i_vol = float(vol_l[i])
        vol_c_minus_i = float(comm_vol[c]) - i_vol
        best_dq = 0.0
        best_d = -1
        # argmax with tie -> lowest label, no sort: (>) takes a strictly
        # better dq, (==, <) takes an equal dq with a lower label — same
        # winner as first-max over ascending labels (oracle pin)
        for d, wd in agg.items():
            dq = (float(wd) - w_c) / w + (
                vol_c_minus_i - float(comm_vol[d])
            ) * i_vol * inv_2w2
            if dq > best_dq or (dq == best_dq and best_d >= 0 and d < best_d):
                best_dq = dq
                best_d = d
        if best_d >= 0 and best_d != c:
            lab[i] = best_d
            comm_vol[best_d] += vol_l[i]
            comm_vol[c] -= vol_l[i]
            moved += 1
    labels[:m] = lab[:m]
    return moved
