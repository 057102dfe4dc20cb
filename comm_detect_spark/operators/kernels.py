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
  volumes on every move, so the plain run decomposition is not enough; the
  sweep is layered (every layer exact, pinned in test_kernels):
  (1) per RUN, every per-(node, community) weight sum is computed in one
  numpy grouped reduction — valid because a run member's neighbors all lie
  outside the run, so their labels are frozen while it processes;
  (2) OPTIMISTIC JACOBI: all of a run's dq argmaxes are evaluated
  vectorized against the run-start cv snapshot (_jacobi_eval), then a
  sequential dirty-walk applies the precomputed decision for every node
  whose read communities ({own} ∪ candidates) no earlier in-run mover
  wrote — for such a node the snapshot IS the live state, so the decision
  is exactly the sequential one; (3) dirtied nodes recompute per-group
  against the live cv (a lean list-indexed loop — the dict hashing of the
  previous kernel is gone everywhere). An adaptive windowed gate skips the
  Jacobi evaluation in regimes where churn dirties everything (hub-dense
  sweep-1 regions) and re-probes as the sweep converges.

Reference for semantics: plp.cc:22-69 (dominant label), plm.cc:192-242
(ReturnCommunity dQ), with the repo-wide lowest-label tie pin (SURVEY §5.2).
"""

from __future__ import annotations

import ctypes
from bisect import bisect_left

import numpy as np

from comm_detect_spark.operators import _native
from comm_detect_spark.oracle.algorithms import Adjacency

_P64 = ctypes.POINTER(ctypes.c_int64)


def _p(a: np.ndarray):
    return a.ctypes.data_as(_P64)


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


def _jacobi_eval(
    nodes_p, nstarts, nends, g_node, g_label, gsumf, labc, cv_np, vol,
    w, inv_2w2, a, big_k,
):
    """Vectorized dq argmax for EVERY present node of a run against the
    run-start community volumes (Jacobi evaluation): elementwise float64
    ops in the same order as the scalar path, winner = first group reaching
    the node max over label-ascending groups (the oracle's
    max-dq/lowest-label tie pin), strict dq > 0 gate. Returns
    (win_label, mov) arrays aligned with nodes_p; the caller's sequential
    dirty-walk decides for which nodes the run-start snapshot is still the
    live truth."""
    own = labc[nodes_p]
    counts = nends - nstarts
    # w_c: the (node, own-community) group if present (groups are sorted by
    # the packed (node, label) key, so one searchsorted finds it)
    gkey = (g_node - a) * big_k + g_label
    okey = (nodes_p - a) * big_k + own
    pos = np.minimum(np.searchsorted(gkey, okey), gkey.size - 1)
    w_c = np.where(gkey[pos] == okey, gsumf[pos], 0.0)
    ivol = vol[nodes_p].astype(np.float64)
    vcmi = cv_np[own].astype(np.float64) - ivol
    w_c_rep = np.repeat(w_c, counts)
    vcmi_rep = np.repeat(vcmi, counts)
    ivol_rep = np.repeat(ivol, counts)
    cvd = cv_np[g_label].astype(np.float64)
    dq = (gsumf - w_c_rep) / w + (vcmi_rep - cvd) * ivol_rep * inv_2w2
    nmax = np.maximum.reduceat(dq, nstarts)
    is_max = dq == np.repeat(nmax, counts)
    hits = np.flatnonzero(is_max)
    hn = np.repeat(np.arange(nodes_p.size, dtype=np.int64), counts)[hits]
    hfirst = np.empty(hn.size, dtype=bool)
    hfirst[0] = True
    hfirst[1:] = hn[1:] != hn[:-1]
    win = hits[hfirst]
    win_label = g_label[win]
    mov = (nmax > 0.0) & (win_label != own)
    return win_label, mov


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
    strict dQ > 0 gate, same lowest-label tie — see the dq expression
    below, kept operation-for-operation identical).

    Structure: the sweep order splits into maximal RUNS [a, b) of
    consecutive nodes with no intra-run edge (the LPA decomposition).
    Louvain cannot Jacobi a whole run (moves interact through the GLOBAL
    community volumes), but a run still freezes every input except cv:
    a run member's neighbors all lie outside the run, so their labels —
    and therefore each member's per-community weight sums w(i->D) and own
    weight w(i->C) — are constant while the run processes. Those sums are
    computed for the whole run in ONE numpy grouped reduction (the per-edge
    cost leaves Python entirely); the remaining sequential part is a lean
    per-GROUP loop over precomputed lists that only reads the evolving
    cv[] and performs the exact dq argmax. ``comm_vol`` is a mutable
    {label: volume} dict or int64 label-indexed array, updated
    incrementally per move (plm.cc:306-311) and written back on exit.
    ``movable``: optional bool mask over [0, m) — frozen vertices keep
    their label but still count as neighbors (the symmetry-breaking
    sweeps; None == all movable, the oracle semantics). Returns #moved."""
    if m is None:
        m = adj.n
    if m == 0:
        return 0
    w = float(weight_net)
    inv_2w2 = 1.0 / (2.0 * w * w)
    indptr, indices, weights = adj.indptr, adj.indices, adj.weights
    # local dense community codes over every label this sweep can read or
    # write (moves only adopt labels of existing neighbors): cv becomes a
    # flat list the hot loop indexes directly instead of hashing
    uniq = np.unique(labels[: adj.n])
    big_k = uniq.size
    labc = np.ascontiguousarray(
        np.searchsorted(uniq, labels[: adj.n]), dtype=np.int64
    )
    if isinstance(comm_vol, dict):
        cv = [comm_vol[int(l)] for l in uniq.tolist()]
    else:
        cv = np.asarray(comm_vol)[uniq].tolist()
    cv_np = np.asarray(cv, dtype=np.int64)  # numpy twin, always in sync
    native = _native.local_move_walk()
    vol_c = np.ascontiguousarray(vol, dtype=np.int64)
    if native is None:
        labc_l = labc.tolist()
        vol_l = vol.tolist()
    prev = _prev_member_neighbor(adj, m)
    prev_l = prev.tolist()
    pack_ok = big_k.bit_length() + m.bit_length() <= 62
    # The optimistic-Jacobi evaluation (see the walk below) pays off in
    # proportion to the CLEAN fraction — nodes whose read communities no
    # earlier in-run mover touched. That fraction is region- and
    # regime-dependent (hub-dense id ranges churn shared communities;
    # convergence-tail sweeps are almost all clean), so a windowed
    # adaptive gate with periodic re-probing decides per run whether to
    # evaluate — a sticky kill switch would sample only the prefix.
    # Data-deterministic: both paths are exact, the gate only affects
    # speed, never output.
    analyze = pack_ok
    win_seen = win_vec = 0
    run_i = 0
    moved = 0
    a = 0
    while a < m:
        b = a + 1
        while b < m and prev_l[b] < a:
            b += 1
        lo, hi = int(indptr[a]), int(indptr[b])
        if hi > lo:
            deg = np.diff(indptr[a : b + 1])
            src = np.repeat(np.arange(a, b, dtype=np.int64), deg)
            nbr = indices[lo:hi]
            wt = weights[lo:hi]
            keep = nbr != src  # self-loops excluded from w_c/w_d (plm.cc:212)
            if movable is not None:
                keep &= np.repeat(movable[a:b], deg)
            src, nbr, wt = src[keep], nbr[keep], wt[keep]
            if src.size:
                cand = labc[nbr]
                # group by (node, community). Fast path: CSR rows are
                # dst-sorted, so while labels are still id-ordered (the
                # singleton start of every level — the most expensive
                # sweep) the rows ARE the groups: one vectorized check
                # skips the sort+reduce entirely
                if src.size == 1 or bool(
                    np.all((src[1:] != src[:-1]) | (cand[1:] > cand[:-1]))
                ):
                    g_node, g_label, gsum = src, cand, wt
                else:
                    # packed-key quicksort when the key fits (stability
                    # irrelevant: ties are exact-duplicate groups and the
                    # integer group sum is order-independent)
                    if pack_ok:
                        order = np.argsort((src - a) * big_k + cand)
                    else:
                        order = np.lexsort((cand, src))
                    s, l, wv = src[order], cand[order], wt[order]
                    boundary = np.empty(s.size, dtype=bool)
                    boundary[0] = True
                    boundary[1:] = (s[1:] != s[:-1]) | (l[1:] != l[:-1])
                    starts = np.flatnonzero(boundary)
                    gsum = np.add.reduceat(wv, starts)
                    g_node, g_label = s[starts], l[starts]
                nfirst = np.empty(g_node.size, dtype=bool)
                nfirst[0] = True
                nfirst[1:] = g_node[1:] != g_node[:-1]
                nstarts = np.flatnonzero(nfirst)
                nodes_p = g_node[nstarts]
                nends = np.append(nstarts[1:], g_node.size)
                if native is not None:
                    # compiled walk (same op order — _native docstring):
                    # the whole sequential part leaves Python, so neither
                    # the Jacobi evaluation nor the list mirrors pay off
                    moved += int(native(
                        nodes_p.size, _p(nodes_p), _p(nstarts), _p(nends),
                        _p(g_label), _p(gsum), _p(labc), _p(cv_np),
                        _p(vol_c), w, inv_2w2,
                    ))
                    a = b
                    continue
                nodes_l = nodes_p.tolist()
                nst = nstarts.tolist()
                nen = nends.tolist()
                gl = g_label.tolist()
                gs = gsum.tolist()

                def _scalar_span(t0: int, t1: int) -> None:
                    """Sequential exact part for present nodes [t0, t1):
                    per-group dq argmax against the live cv[]; groups are
                    label-ascending per node, and the (>) / (==, <)
                    comparison reproduces the oracle's
                    first-max-over-ascending-labels tie pin."""
                    nonlocal moved
                    for t in range(t0, t1):
                        i = nodes_l[t]
                        c = labc_l[i]
                        g0, g1 = nst[t], nen[t]
                        pos = bisect_left(gl, c, g0, g1)
                        w_c = (
                            float(gs[pos])
                            if pos < g1 and gl[pos] == c
                            else 0.0
                        )
                        i_vol = float(vol_l[i])
                        vol_c_minus_i = float(cv[c]) - i_vol
                        best_dq = 0.0
                        best_d = -1
                        for g in range(g0, g1):
                            d = gl[g]
                            dq = (gs[g] - w_c) / w + (
                                vol_c_minus_i - cv[d]
                            ) * i_vol * inv_2w2
                            if dq > best_dq or (
                                dq == best_dq and best_d >= 0 and d < best_d
                            ):
                                best_dq = dq
                                best_d = d
                        if best_d >= 0 and best_d != c:
                            labc_l[i] = best_d
                            labc[i] = best_d
                            vi = vol_l[i]
                            cv[best_d] += vi
                            cv[c] -= vi
                            cv_np[best_d] += vi
                            cv_np[c] -= vi
                            moved += 1

                run_i += 1
                # while disabled, re-probe every 8th run: the clean
                # fraction is region- and regime-dependent, so a bad
                # prefix must not blind the sweep to a payable tail
                this_run = pack_ok and (analyze or run_i % 8 == 0)
                if not this_run or len(nodes_l) < 12:
                    _scalar_span(0, len(nodes_l))
                else:
                    # OPTIMISTIC JACOBI + DIRTY-WALK. Evaluate every
                    # node's decision vectorized against the RUN-START cv
                    # snapshot, then walk the run in sweep order: a node
                    # none of whose read communities ({own} ∪ candidates)
                    # has been written earlier in this run sees cv values
                    # identical to the snapshot — its precomputed decision
                    # IS the sequential decision (neighbor labels are
                    # frozen for the whole run, so the weight sums never
                    # drift). Only nodes whose reads were dirtied recompute
                    # against the live cv. Exactness does not depend on
                    # how many nodes stay clean — dirtiness only routes
                    # between two exact evaluations.
                    win_label, mov = _jacobi_eval(
                        nodes_p, nstarts, nends, g_node, g_label,
                        gsum.astype(np.float64), labc, cv_np, vol,
                        w, inv_2w2, a, big_k,
                    )
                    win_l = win_label.tolist()
                    mov_l = mov.tolist()
                    dirty = bytearray(big_k)
                    any_dirty = False  # no write yet -> every node clean
                    for t in range(len(nodes_l)):
                        i = nodes_l[t]
                        c = labc_l[i]
                        g0, g1 = nst[t], nen[t]
                        win_seen += 1
                        is_dirty = False
                        if any_dirty:
                            is_dirty = dirty[c]
                            if not is_dirty:
                                for g in range(g0, g1):
                                    if dirty[gl[g]]:
                                        is_dirty = True
                                        break
                        if not is_dirty:
                            win_vec += 1
                            if mov_l[t]:
                                d = win_l[t]
                                labc_l[i] = d
                                labc[i] = d
                                vi = vol_l[i]
                                cv[d] += vi
                                cv[c] -= vi
                                cv_np[d] += vi
                                cv_np[c] -= vi
                                dirty[d] = 1
                                dirty[c] = 1
                                any_dirty = True
                                moved += 1
                            continue
                        # dirtied reads: recompute against the live cv —
                        # same expression, op for op, as _scalar_span
                        pos = bisect_left(gl, c, g0, g1)
                        w_c = (
                            float(gs[pos])
                            if pos < g1 and gl[pos] == c
                            else 0.0
                        )
                        i_vol = float(vol_l[i])
                        vol_c_minus_i = float(cv[c]) - i_vol
                        best_dq = 0.0
                        best_d = -1
                        for g in range(g0, g1):
                            d = gl[g]
                            dq = (gs[g] - w_c) / w + (
                                vol_c_minus_i - cv[d]
                            ) * i_vol * inv_2w2
                            if dq > best_dq or (
                                dq == best_dq and best_d >= 0 and d < best_d
                            ):
                                best_dq = dq
                                best_d = d
                        if best_d >= 0 and best_d != c:
                            labc_l[i] = best_d
                            labc[i] = best_d
                            vi = vol_l[i]
                            cv[best_d] += vi
                            cv[c] -= vi
                            cv_np[best_d] += vi
                            cv_np[c] -= vi
                            dirty[best_d] = 1
                            dirty[c] = 1
                            any_dirty = True
                            moved += 1
                    if win_seen > 20_000:
                        analyze = win_vec * 3 >= win_seen
                        win_seen = win_vec = 0
        a = b
    labels[:m] = uniq[labc[:m]]
    # cv_np is authoritative on both paths (the Python walk writes through)
    if isinstance(comm_vol, dict):
        for lab_k, v_k in zip(uniq.tolist(), cv_np.tolist()):
            comm_vol[lab_k] = v_k
    else:
        comm_vol[uniq] = cv_np
    return moved
