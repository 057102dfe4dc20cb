"""Reference-semantics graph algorithms over NumPy CSR arrays.

Semantics are pinned to the reference implementation (citations are
``file:line`` into /root/reference) with ONE deliberate change, sanctioned by
SURVEY.md §5.2: wherever the reference breaks ties nondeterministically
(unordered_map iteration order — plp.cc:38-40, plm.cc:230-239), we pin the
tie-break to "lowest label wins". All arithmetic is float64 (the reference
mixes float/double; the comparison gate is 1e-6 on final modularity).

Graph convention (matches graph.cc:31-51): the edge array contains every
adjacency ENTRY — an undirected edge appears as both (u,v) and (v,u); a
self-loop appears once. Weights are positive integers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Adjacency:
    """CSR over adjacency entries: for node u, neighbors are
    ``indices[indptr[u]:indptr[u+1]]`` with weights ``weights[...]``."""

    n: int
    indptr: np.ndarray  # int64, len n+1
    indices: np.ndarray  # int64
    weights: np.ndarray  # int64

    @staticmethod
    def from_entries(n: int, src, dst, weight=None) -> "Adjacency":
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if weight is None:
            weight = np.ones_like(src)
        weight = np.asarray(weight, dtype=np.int64)
        order = np.lexsort((dst, src))
        src, dst, weight = src[order], dst[order], weight[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, src + 1, 1)
        indptr = np.cumsum(indptr)
        return Adjacency(n=n, indptr=indptr, indices=dst, weights=weight)

    def nbrs(self, u: int) -> tuple[np.ndarray, np.ndarray]:
        lo, hi = self.indptr[u], self.indptr[u + 1]
        return self.indices[lo:hi], self.weights[lo:hi]

    @property
    def weight_net(self) -> int:
        """Sum over ALL adjacency entries (modularity.h:54-66,
        plm.cc:414-433): 2x total undirected edge weight, self-loops once."""
        return int(self.weights.sum())


def volumes(adj: Adjacency) -> np.ndarray:
    """Weighted degree with self-loops counted TWICE
    (modularity.h:68-81, plm.cc:414-429)."""
    vol = np.zeros(adj.n, dtype=np.int64)
    src = np.repeat(np.arange(adj.n, dtype=np.int64), np.diff(adj.indptr))
    np.add.at(vol, src, adj.weights)
    self_mask = src == adj.indices
    np.add.at(vol, src[self_mask], adj.weights[self_mask])
    return vol


def modularity(adj: Adjacency, labels: np.ndarray) -> float:
    """Reference formula (modularity.h:175-191):
    Q = sum_C [ w_in(C)/W - vol(C)^2 / (4 W^2) ]
    where W = weight_net (all adjacency entries) and w_in(C) = sum of
    adjacency entries with BOTH endpoints in C (intra edges twice,
    self-loops once — modularity.h:21-52)."""
    labels = np.asarray(labels, dtype=np.int64)
    w = float(adj.weight_net)
    src = np.repeat(np.arange(adj.n, dtype=np.int64), np.diff(adj.indptr))
    intra = labels[src] == labels[adj.indices]
    dense = _dense_map(labels)
    k = dense.max() + 1 if dense.size else 0
    w_in = np.zeros(k, dtype=np.float64)
    np.add.at(w_in, dense[src[intra]], adj.weights[intra].astype(np.float64))
    vol_c = np.zeros(k, dtype=np.float64)
    np.add.at(vol_c, dense, volumes(adj).astype(np.float64))
    return float(np.sum(w_in / w - (vol_c * vol_c) / (4.0 * w * w)))


def modularity_difference(
    adj: Adjacency, labels: np.ndarray, i: int, target: int
) -> float:
    """Standalone dQ of moving node i into node ``target``'s community
    (modularity.h:255-284): (w_d - w_c)/W + (vol_{C\\i} - vol_{D\\i}) *
    vol_i / (2 W^2), with self-edges excluded from w_c/w_d."""
    labels = np.asarray(labels, dtype=np.int64)
    w = float(adj.weight_net)
    vol = volumes(adj)
    c, d = labels[i], labels[target]
    nb, wt = adj.nbrs(i)
    not_self = nb != i
    w_c = int(wt[not_self & (labels[nb] == c)].sum())
    w_d = int(wt[not_self & (labels[nb] == d)].sum())
    others = np.arange(adj.n) != i
    vol_c = int(vol[others & (labels == c)].sum())
    vol_d = int(vol[others & (labels == d) & (labels != c)].sum())
    return (w_d - w_c) / w + (vol_c - vol_d) * float(vol[i]) / (2.0 * w * w)


def _dense_map(labels: np.ndarray) -> np.ndarray:
    """Relabel to dense 0..k-1 in ascending label order (deterministic —
    plp.cc:116-134 semantics; we use it for PLM too, pinning plm.cc:245-262's
    unordered variant)."""
    _, dense = np.unique(labels, return_inverse=True)
    return dense.astype(np.int64)


def canonical_labels(labels: np.ndarray) -> np.ndarray:
    """Canonical partition form for comparisons: community id = min member
    vertex id. Invariant under any relabeling of either side."""
    labels = np.asarray(labels, dtype=np.int64)
    dense = _dense_map(labels)
    k = dense.max() + 1 if dense.size else 0
    rep = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(rep, dense, np.arange(labels.size, dtype=np.int64))
    return rep[dense]


# ---------------------------------------------------------------------------
# Label propagation (PLP — plp.cc)
# ---------------------------------------------------------------------------


def _dominant_labels_bulk(
    adj: Adjacency, labels: np.ndarray
) -> np.ndarray:
    """Vectorized dominant_label (plp.cc:22-69) for ALL nodes against a
    frozen label vector (Jacobi / synchronous step). Adoption requires a
    candidate weight strictly > 0 (the reference seeds the argmax with
    (current_label, 0) — plp.cc:36-37); ties -> lowest label (our pin)."""
    src = np.repeat(np.arange(adj.n, dtype=np.int64), np.diff(adj.indptr))
    nbr_label = labels[adj.indices]
    # aggregate (node, label) -> sum(weight) via sort-based grouping
    order = np.lexsort((nbr_label, src))
    s, l, w = src[order], nbr_label[order], adj.weights[order]
    boundary = np.empty(s.size, dtype=bool)
    if s.size:
        boundary[0] = True
        boundary[1:] = (s[1:] != s[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(boundary)
    sums = np.add.reduceat(w, starts) if starts.size else np.empty(0, np.int64)
    g_node, g_label = s[starts], l[starts]
    # argmax per node: sort by (node, -sum, label), take first per node
    order2 = np.lexsort((g_label, -sums, g_node))
    g_node, g_label, sums = g_node[order2], g_label[order2], sums[order2]
    first = np.empty(g_node.size, dtype=bool)
    if g_node.size:
        first[0] = True
        first[1:] = g_node[1:] != g_node[:-1]
    out = labels.copy()
    win_node = g_node[first]
    win_label = g_label[first]
    win_sum = sums[first]
    adopt = win_sum > 0
    out[win_node[adopt]] = win_label[adopt]
    return out


def lpa_sync(adj: Adjacency, eps: float = 1e-4, max_iter: int | None = None):
    """Synchronous (Jacobi) LPA. Init labels=id (plp.cc:78-81); stop when
    updated <= threshold or |updated_prev - updated| <= threshold with
    threshold = int(n*eps) (plp.cc:90-93, plp.h: threshold = n*EPS as int).
    Returns (labels, iterations)."""
    labels = np.arange(adj.n, dtype=np.int64)
    threshold = int(adj.n * eps)
    updated, updated_prev, iters = adj.n, 0, 0
    while (updated > threshold) and (abs(updated_prev - updated) > threshold):
        if max_iter is not None and iters >= max_iter:
            break
        updated_prev = updated
        new = _dominant_labels_bulk(adj, labels)
        updated = int((new != labels).sum())
        labels = new
        iters += 1
    return labels, iters


def lpa_async_sweep(
    adj: Adjacency,
    labels: np.ndarray,
    nodes: np.ndarray | None = None,
) -> int:
    """One asynchronous (Gauss-Seidel) sweep IN PLACE over ``nodes`` in the
    given order (default: all, ascending vid — the reference's racy parallel
    sweep plp.cc:96-104 reduced to its deterministic sequential core).
    Shared with the Spark applyInPandas kernel. Returns #updated."""
    if nodes is None:
        nodes = np.arange(adj.n, dtype=np.int64)
    updated = 0
    for u in nodes:
        nb, wt = adj.nbrs(u)
        if nb.size == 0:
            continue
        cand = labels[nb]
        order = np.argsort(cand, kind="stable")
        cand_s, wt_s = cand[order], wt[order]
        boundary = np.empty(cand_s.size, dtype=bool)
        boundary[0] = True
        boundary[1:] = cand_s[1:] != cand_s[:-1]
        starts = np.flatnonzero(boundary)
        sums = np.add.reduceat(wt_s, starts)
        # max sum, tie -> lowest label (cand_s[starts] ascending)
        best = int(np.argmax(sums))
        if sums[best] > 0:
            new = int(cand_s[starts[best]])
            if new != labels[u]:
                labels[u] = new
                updated += 1
    return updated


def lpa_async(adj: Adjacency, eps: float = 1e-4, max_iter: int | None = None):
    """Asynchronous LPA: sequential sweeps in vid order, same stopping rule
    as lpa_sync. Returns (labels, iterations)."""
    labels = np.arange(adj.n, dtype=np.int64)
    threshold = int(adj.n * eps)
    updated, updated_prev, iters = adj.n, 0, 0
    while (updated > threshold) and (abs(updated_prev - updated) > threshold):
        if max_iter is not None and iters >= max_iter:
            break
        updated_prev = updated
        updated = lpa_async_sweep(adj, labels)
        iters += 1
    return labels, iters


# ---------------------------------------------------------------------------
# Louvain (PLM — plm.cc)
# ---------------------------------------------------------------------------


def local_move_sweep(
    adj: Adjacency,
    labels: np.ndarray,
    vol: np.ndarray,
    comm_vol: dict[int, int] | np.ndarray,
    weight_net: int,
    nodes: np.ndarray | None = None,
) -> int:
    """One asynchronous local-move sweep IN PLACE (plm.cc:296-314).

    Per node i (ReturnCommunity, plm.cc:192-242): candidates D are the
    communities of i's non-self neighbors; dQ(i->D) =
      (w(i->D) - w(i->C))/W  +  (vol(C\\i) - vol(D)) * vol_i / (2 W^2)
    (weight_sq = 2*weight_net, plm.cc:443; the divide-twice at plm.cc:218-219
    yields the 2W^2 denominator). Move only if dQ strictly > 0
    (plm.cc:227,234); ties -> lowest community id (our pin). ``comm_vol`` is
    updated incrementally on each move (plm.cc:306-311) — callers pass a
    mutable int64 array indexed by label. Shared with the Spark kernel.
    Returns #moved."""
    if nodes is None:
        nodes = np.arange(adj.n, dtype=np.int64)
    w = float(weight_net)
    inv_2w2 = 1.0 / (2.0 * w * w)
    moved = 0
    for i in nodes:
        nb, wt = adj.nbrs(i)
        not_self = nb != i
        nb, wt = nb[not_self], wt[not_self]
        if nb.size == 0:
            continue
        c = int(labels[i])
        cand = labels[nb]
        order = np.argsort(cand, kind="stable")
        cand_s, wt_s = cand[order], wt[order]
        boundary = np.empty(cand_s.size, dtype=bool)
        boundary[0] = True
        boundary[1:] = cand_s[1:] != cand_s[:-1]
        starts = np.flatnonzero(boundary)
        d_labels = cand_s[starts]
        d_weights = np.add.reduceat(wt_s, starts).astype(np.float64)
        # weight to own community (0 if no neighbor in it — plm.cc:212)
        pos = np.searchsorted(d_labels, c)
        w_c = (
            float(d_weights[pos])
            if pos < d_labels.size and d_labels[pos] == c
            else 0.0
        )
        i_vol = float(vol[i])
        vol_c_minus_i = float(comm_vol[c]) - i_vol
        d_vols = np.array(
            [float(comm_vol[int(d)]) for d in d_labels], dtype=np.float64
        )
        dq = (d_weights - w_c) / w + (vol_c_minus_i - d_vols) * i_vol * inv_2w2
        # candidate D == C gives dq <= 0, never beats the strict > 0 gate
        best = int(np.argmax(dq))  # ties: first occurrence = lowest label
        if dq[best] > 0.0 and int(d_labels[best]) != c:
            d = int(d_labels[best])
            labels[i] = d
            comm_vol[d] += vol[i]
            comm_vol[c] -= vol[i]
            moved += 1
    return moved


def _local_move(adj: Adjacency, eps: float = 1e-5) -> tuple[np.ndarray, int]:
    """Full local-move phase (plm.cc:265-333): singleton init, async sweeps
    until stable or updated <= int(n*eps); dense relabel if >1 sweep."""
    labels = np.arange(adj.n, dtype=np.int64)
    vol = volumes(adj)
    comm_vol = vol.copy()  # singleton communities (plm.cc:280-285)
    w = adj.weight_net
    threshold = int(adj.n * eps)
    iterations = 0
    unstable, updated = True, adj.n
    while unstable and updated > threshold:
        iterations += 1
        updated = local_move_sweep(adj, labels, vol, comm_vol, w)
        unstable = updated > 0
    if iterations > 1:
        labels = _dense_map(labels)
    return labels, iterations


def _coarsen(adj: Adjacency, labels: np.ndarray) -> Adjacency:
    """Contract communities to supernodes (plm.cc:48-171): coarse entry
    (C_i,C_j) = sum of entries (u,v) with labels (C_i,C_j); intra mass
    becomes the supernode self-loop; weight_net is invariant."""
    n2 = int(labels.max()) + 1
    src = np.repeat(np.arange(adj.n, dtype=np.int64), np.diff(adj.indptr))
    c_src, c_dst = labels[src], labels[adj.indices]
    key = c_src * n2 + c_dst
    uniq, inv = np.unique(key, return_inverse=True)
    w2 = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(w2, inv, adj.weights)
    return Adjacency.from_entries(n2, uniq // n2, uniq % n2, w2)


def louvain(
    adj: Adjacency, eps: float = 1e-5, max_levels: int | None = None
) -> tuple[np.ndarray, int]:
    """Recursive Louvain (plm.cc:336-412): local move; if anything moved,
    coarsen, recurse, prolong (new[i] = coarse[labels[i]], plm.cc:174-185).
    Returns (labels, levels)."""
    labels, _ = _local_move(adj, eps)
    levels = 1
    if not np.array_equal(labels, np.arange(adj.n, dtype=np.int64)):
        if max_levels is None or levels < max_levels:
            coarse = _coarsen(adj, labels)
            coarse_labels, sub_levels = louvain(
                coarse,
                eps,
                None if max_levels is None else max_levels - 1,
            )
            labels = coarse_labels[labels]
            levels += sub_levels
    return labels, levels


# ---------------------------------------------------------------------------
# North-rule extensions (Table C): PageRank, CC, triangles
# ---------------------------------------------------------------------------


def pagerank(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None = None,
    damping: float = 0.85,
    iterations: int = 10,
    tol: float | None = None,
) -> np.ndarray:
    """Weighted PageRank over a DIRECTED edge list.

    r' = (1-d)/n + d * (sum_{u->v} r_u * w(u,v)/wout(u) + dangling_mass/n)
    where dangling_mass = sum of r over nodes with no out-edges. Starts
    uniform. Fixed ``iterations``, or early-stop when L1 diff < tol."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if weight is None:
        weight = np.ones_like(src, dtype=np.float64)
    weight = np.asarray(weight, dtype=np.float64)
    wout = np.zeros(n, dtype=np.float64)
    np.add.at(wout, src, weight)
    dangling = wout == 0
    r = np.full(n, 1.0 / n, dtype=np.float64)
    frac = weight / wout[src]
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, r[src] * frac)
        dangling_mass = r[dangling].sum()
        r_new = (1.0 - damping) / n + damping * (contrib + dangling_mass / n)
        if tol is not None and np.abs(r_new - r).sum() < tol:
            r = r_new
            break
        r = r_new
    return r


def connected_components(adj: Adjacency) -> np.ndarray:
    """Undirected connected components; component id = min vid in the
    component (exact-match contract, SURVEY Table C)."""
    comp = np.arange(adj.n, dtype=np.int64)
    src = np.repeat(np.arange(adj.n, dtype=np.int64), np.diff(adj.indptr))
    changed = True
    while changed:
        prev = comp
        m = np.minimum(comp[src], comp[adj.indices])
        comp = comp.copy()
        np.minimum.at(comp, src, m)
        np.minimum.at(comp, adj.indices, m)
        # pointer-jump for fast convergence on long paths
        comp = np.minimum(comp, comp[comp])
        changed = not np.array_equal(prev, comp)
    return comp


def triangle_counts(adj: Adjacency) -> tuple[np.ndarray, int]:
    """Per-vertex + global triangle counts on the simple undirected graph
    (self-loops and weights ignored; parallel entries deduped)."""
    src = np.repeat(np.arange(adj.n, dtype=np.int64), np.diff(adj.indptr))
    mask = src != adj.indices
    a = np.minimum(src[mask], adj.indices[mask])
    b = np.maximum(src[mask], adj.indices[mask])
    key = a * adj.n + b
    uniq = np.unique(key)
    ea, eb = uniq // adj.n, uniq % adj.n  # oriented a < b
    nbr = {u: set() for u in range(adj.n)}
    for x, y in zip(ea, eb):
        nbr[int(x)].add(int(y))
    per = np.zeros(adj.n, dtype=np.int64)
    total = 0
    for x, y in zip(ea, eb):
        common = nbr[int(x)] & nbr[int(y)]
        for z in common:
            per[int(x)] += 1
            per[int(y)] += 1
            per[z] += 1
            total += 1
    return per, total


def k_core(adj: Adjacency, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-core membership on the simple undirected graph (self-loops and
    weights ignored, parallel entries deduped — the same semantics as
    operators/kcore.py). Returns (vids, in_core) over the vertices that
    appear in at least one simple edge."""
    src = np.repeat(np.arange(adj.n, dtype=np.int64), np.diff(adj.indptr))
    mask = src != adj.indices
    a = np.minimum(src[mask], adj.indices[mask])
    b = np.maximum(src[mask], adj.indices[mask])
    key = a * adj.n + b
    uniq = np.unique(key)
    ea, eb = uniq // adj.n, uniq % adj.n
    present = np.unique(np.concatenate([ea, eb]))
    alive_e = np.ones(ea.size, dtype=bool)
    alive_v = np.zeros(adj.n, dtype=bool)
    alive_v[present] = True
    while True:
        deg = np.bincount(ea[alive_e], minlength=adj.n) + np.bincount(
            eb[alive_e], minlength=adj.n
        )
        peel = alive_v & (deg < k)
        if not peel.any():
            break
        alive_v &= ~peel
        alive_e &= alive_v[ea] & alive_v[eb]
    return present, alive_v[present]


def personalized_pagerank(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    seeds,
    weight: np.ndarray | None = None,
    damping: float = 0.85,
    iterations: int = 10,
) -> np.ndarray:
    """Random walk with restart: teleport and dangling mass land on the
    seed set (p = 1/|S| on seeds); r0 = p. Twin of
    operators/pagerank.py::personalized_pagerank."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if weight is None:
        weight = np.ones_like(src, dtype=np.float64)
    weight = np.asarray(weight, dtype=np.float64)
    seeds = np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64)
    if seeds.size == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    reset = np.zeros(n, dtype=np.float64)
    reset[seeds] = 1.0 / seeds.size
    wout = np.zeros(n, dtype=np.float64)
    np.add.at(wout, src, weight)
    dangling = wout == 0
    frac = weight / wout[src]
    r = reset.copy()
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, r[src] * frac)
        dm = r[dangling].sum()
        r = (1.0 - damping) * reset + damping * (contrib + dm * reset)
    return r


def hits(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None = None,
    iterations: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """Kleinberg HITS with L2 normalization after each half-step; returns
    (hub, auth). Twin of operators/hits.py."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if weight is None:
        weight = np.ones_like(src, dtype=np.float64)
    weight = np.asarray(weight, dtype=np.float64)
    hub = np.ones(n, dtype=np.float64)
    auth = np.ones(n, dtype=np.float64)
    for _ in range(iterations):
        a = np.zeros(n, dtype=np.float64)
        np.add.at(a, dst, hub[src] * weight)
        na = np.sqrt((a * a).sum())
        auth = a / na if na > 0 else a
        h = np.zeros(n, dtype=np.float64)
        np.add.at(h, src, auth[dst] * weight)
        nh = np.sqrt((h * h).sum())
        hub = h / nh if nh > 0 else h
    return hub, auth


def strongly_connected_components(
    n: int, src: np.ndarray, dst: np.ndarray
) -> np.ndarray:
    """Directed strongly connected components via iterative Kosaraju;
    scc id = min vid in the SCC (same exact-match contract as
    connected_components). Twin of operators/scc.py."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    adj: list[list[int]] = [[] for _ in range(n)]
    radj: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:  # self-loops never change SCC membership
            adj[a].append(b)
            radj[b].append(a)
    # pass 1: forward DFS finish order (iterative — no recursion limit)
    visited = np.zeros(n, dtype=bool)
    order: list[int] = []
    for s in range(n):
        if visited[s]:
            continue
        visited[s] = True
        stack: list[tuple[int, int]] = [(s, 0)]
        while stack:
            v, i = stack[-1]
            if i < len(adj[v]):
                stack[-1] = (v, i + 1)
                w = adj[v][i]
                if not visited[w]:
                    visited[w] = True
                    stack.append((w, 0))
            else:
                order.append(v)
                stack.pop()
    # pass 2: reverse-graph DFS in reverse finish order
    comp = np.full(n, -1, dtype=np.int64)
    for s in reversed(order):
        if comp[s] != -1:
            continue
        comp[s] = s
        members = [s]
        dfs = [s]
        while dfs:
            v = dfs.pop()
            for w in radj[v]:
                if comp[w] == -1:
                    comp[w] = s
                    members.append(w)
                    dfs.append(w)
        m = min(members)
        comp[np.asarray(members, dtype=np.int64)] = m
    return comp
