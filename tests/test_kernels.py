"""Fast execution kernels == oracle kernels, element-exact (no Spark).

The oracle (per-node numpy loops) defines the semantics; kernels.py is the
execution path shipped into applyInPandas. Parity must be exact — same
labels, same update counts — on the reference fixture (jazz), on random
RMAT-ish graphs with weights + self-loops, and on adversarial layouts
(path graph = worst case for run decomposition: every run has length 1).
"""

import numpy as np
import pytest

from comm_detect_spark.operators.kernels import (
    _prev_member_neighbor,
    local_move_sweep_fast,
    lpa_async_sweep_fast,
)
from comm_detect_spark.oracle.algorithms import (
    Adjacency,
    local_move_sweep,
    lpa_async_sweep,
    volumes,
)


def _random_graph(n: int, m: int, seed: int, self_loops: bool = True):
    """Symmetric adjacency entries with integer weights (+ some self-loops)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 5, src.size)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    if self_loops:
        loops = rng.integers(0, n, max(n // 20, 1))
        s = np.concatenate([s, loops])
        d = np.concatenate([d, loops])
        ww = np.concatenate([ww, rng.integers(1, 5, loops.size)])
    # dedupe parallel entries (sum weights) for a clean Adjacency
    key = s * n + d
    uniq, inv = np.unique(key, return_inverse=True)
    w2 = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(w2, inv, ww)
    return Adjacency.from_entries(n, uniq // n, uniq % n, w2)


class TestPrevMemberNeighbor:
    def test_matches_bruteforce(self):
        adj = _random_graph(200, 800, seed=1)
        got = _prev_member_neighbor(adj, adj.n)
        for v in range(adj.n):
            nb, _ = adj.nbrs(v)
            smaller = nb[nb < v]
            want = int(smaller.max()) if smaller.size else -1
            assert got[v] == want, v


class TestLpaAsyncParity:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_graphs_multi_sweep(self, seed):
        adj = _random_graph(300, 1500, seed=seed)
        la = np.arange(adj.n, dtype=np.int64)
        lb = la.copy()
        for _ in range(4):
            ua = lpa_async_sweep(adj, la)
            ub = lpa_async_sweep_fast(adj, lb)
            assert ua == ub
            assert np.array_equal(la, lb)

    def test_jazz(self, jazz_adj):
        la = np.arange(jazz_adj.n, dtype=np.int64)
        lb = la.copy()
        for _ in range(5):
            ua = lpa_async_sweep(jazz_adj, la)
            ub = lpa_async_sweep_fast(jazz_adj, lb)
            assert ua == ub and np.array_equal(la, lb)

    def test_path_graph_every_run_length_one(self):
        # 0-1-2-...-49: node v always has neighbor v-1 -> runs degenerate to
        # single nodes, the pure sequential regime
        n = 50
        s = np.arange(n - 1)
        adj = Adjacency.from_entries(
            n,
            np.concatenate([s, s + 1]),
            np.concatenate([s + 1, s]),
            np.ones(2 * (n - 1), dtype=np.int64),
        )
        la = np.arange(n, dtype=np.int64)
        lb = la.copy()
        for _ in range(3):
            assert lpa_async_sweep(adj, la) == lpa_async_sweep_fast(adj, lb)
            assert np.array_equal(la, lb)

    def test_block_view_with_externals(self):
        # kernel-shaped input: members [0, m), external stale ids [m, n)
        adj = _random_graph(120, 600, seed=7)
        m = 80
        rng = np.random.Generator(np.random.PCG64(9))
        base = rng.integers(0, 1000, adj.n)
        la, lb = base.copy(), base.copy()
        ua = lpa_async_sweep(adj, la, nodes=np.arange(m, dtype=np.int64))
        ub = lpa_async_sweep_fast(adj, lb, m)
        assert ua == ub and np.array_equal(la, lb)


class TestLocalMoveParity:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_graphs_multi_sweep(self, seed):
        adj = _random_graph(250, 1200, seed=seed)
        vol = volumes(adj)
        w = adj.weight_net
        la = np.arange(adj.n, dtype=np.int64)
        lb = la.copy()
        cva = vol.copy().astype(np.int64)
        cvb = {i: int(v) for i, v in enumerate(vol)}
        for _ in range(4):
            ma = local_move_sweep(adj, la, vol, cva, w)
            mb = local_move_sweep_fast(adj, lb, vol, cvb, w)
            assert ma == mb
            assert np.array_equal(la, lb)
        for i in range(adj.n):
            assert cva[i] == cvb[i]

    def test_jazz(self, jazz_adj):
        adj = jazz_adj
        vol = volumes(adj)
        w = adj.weight_net
        la = np.arange(adj.n, dtype=np.int64)
        lb = la.copy()
        cva = vol.copy()
        cvb = vol.copy()
        for _ in range(5):
            ma = local_move_sweep(adj, la, vol, cva, w)
            mb = local_move_sweep_fast(adj, lb, vol, cvb, w)
            assert ma == mb and np.array_equal(la, lb)
        assert np.array_equal(cva, cvb)

    def test_grid_vector_chunks_fire_and_match_oracle(self, monkeypatch):
        """Parity on a hashed-id 2D grid — the layout where the optimistic
        Jacobi evaluation engages heavily (low degree, no hubs: most nodes
        stay clean through the dirty-walk). Non-vacuity asserted via a
        counter on _jacobi_eval so this test fails if the vectorized path
        ever stops firing here and the parity claim silently degrades to
        scalar-only."""
        from comm_detect_spark.operators import kernels

        side = 40
        n = side * side
        rng = np.random.Generator(np.random.PCG64(0))
        perm = rng.permutation(n)
        srcs, dsts = [], []
        for di, dj in ((0, 1), (1, 0)):
            i = np.arange(n)
            ii, jj = i // side, i % side
            ni, nj = ii + di, jj + dj
            ok = (ni < side) & (nj < side)
            a = perm[i[ok]]
            b = perm[(ni * side + nj)[ok]]
            srcs += [a, b]
            dsts += [b, a]
        s = np.concatenate(srcs)
        d = np.concatenate(dsts)
        adj = Adjacency.from_entries(n, s, d, np.ones(s.size, dtype=np.int64))
        vol = volumes(adj)
        w = adj.weight_net
        fired = {"nodes": 0}
        real = kernels._jacobi_eval

        def counting(nodes_p, *args, **kw):
            fired["nodes"] += nodes_p.size
            return real(nodes_p, *args, **kw)

        monkeypatch.setattr(kernels, "_jacobi_eval", counting)
        # force the pure-Python walk: with the compiled walk active the
        # Jacobi evaluation is bypassed entirely (native parity has its
        # own gate below, test_native_walk_parity)
        monkeypatch.setattr(kernels._native, "local_move_walk", lambda: None)
        la = np.arange(n, dtype=np.int64)
        lb = la.copy()
        cva = vol.copy()
        cvb = vol.copy()
        for _ in range(3):
            ma = local_move_sweep(adj, la, vol, cva, w)
            mb = kernels.local_move_sweep_fast(adj, lb, vol, cvb, w)
            assert ma == mb
            assert np.array_equal(la, lb)
        assert np.array_equal(cva, cvb)
        assert fired["nodes"] > n  # vector path carried the bulk

    def test_movable_mask_equals_oracle_on_subset(self, monkeypatch):
        """The freeze-sweep contract: sweeping with a movable mask equals
        the oracle sweeping ONLY the movable nodes in ascending order
        (frozen vertices keep their labels but stay visible as neighbors).
        Pinned for BOTH walks — the compiled path never sees frozen nodes
        because the row filter removes them before grouping, and that must
        stay output-identical."""
        from comm_detect_spark.operators import kernels
        from comm_detect_spark.operators.kernels import movable_mask

        adj = _random_graph(220, 1100, seed=13)
        vol = volumes(adj)
        w = adj.weight_net
        mask = movable_mask(np.arange(adj.n, dtype=np.int64), sweep=3)
        for force_python in (False, True):
            if force_python:
                monkeypatch.setattr(
                    kernels._native, "local_move_walk", lambda: None
                )
            la = np.arange(adj.n, dtype=np.int64)
            lb = la.copy()
            cva = vol.copy()
            cvb = vol.copy()
            ma = local_move_sweep(
                adj, la, vol, cva, w, nodes=np.flatnonzero(mask)
            )
            mb = kernels.local_move_sweep_fast(
                adj, lb, vol, cvb, w, movable=mask
            )
            assert ma == mb
            assert np.array_equal(la, lb)
            assert np.array_equal(cva, cvb)

    def test_native_walk_parity(self, monkeypatch):
        """The compiled C walk (operators/_native.py) must be element-exact
        vs the pure-Python walk — same labels, same cv, same moved counts —
        across multiple sweeps on a weighted random graph (the float64
        operation order is pinned by -ffp-contract=off; see _native).
        Skips where no C compiler is available (the Python path is the
        portable fallback by design)."""
        from comm_detect_spark.operators import _native, kernels

        if _native.local_move_walk() is None:
            pytest.skip("no native kernel on this platform")
        adj = _random_graph(300, 1500, seed=9)
        vol = volumes(adj)
        w = adj.weight_net
        la = np.arange(adj.n, dtype=np.int64)
        lb = la.copy()
        cva = vol.copy()
        cvb = vol.copy()
        ma_all, mb_all = [], []
        for _ in range(4):
            ma_all.append(
                kernels.local_move_sweep_fast(adj, la, vol, cva, w)
            )
        monkeypatch.setattr(kernels._native, "local_move_walk", lambda: None)
        for _ in range(4):
            mb_all.append(
                kernels.local_move_sweep_fast(adj, lb, vol, cvb, w)
            )
        assert ma_all == mb_all
        assert np.array_equal(la, lb)
        assert np.array_equal(cva, cvb)

    def test_native_cache_refuses_unowned_or_loose_dir(self, tmp_path,
                                                       monkeypatch):
        """r4 advisor (medium): loading a .so from a shared world-writable
        cache lets another local user pre-plant code into every Spark
        worker. A cache dir writable by group/other must be refused (the
        Python walk is the fallback), and the default dir is per-uid 0700."""
        import os

        from comm_detect_spark.operators import _native

        loose = tmp_path / "native_loose"
        loose.mkdir(mode=0o777)
        os.chmod(loose, 0o777)  # mkdir mode is masked by umask — force it
        monkeypatch.setenv("COMM_DETECT_NATIVE_CACHE", str(loose))
        assert _native._build() is None

        own = tmp_path / "native_own"
        monkeypatch.setenv("COMM_DETECT_NATIVE_CACHE", str(own))
        try:
            lib = _native._build()
        except Exception:
            pytest.skip("no C compiler on this platform")
        assert lib is not None
        assert (os.stat(own).st_mode & 0o077) == 0

    def test_block_view_with_externals_and_dict_volumes(self):
        adj = _random_graph(150, 700, seed=11)
        m = 100
        vol = volumes(adj)
        w = adj.weight_net
        rng = np.random.Generator(np.random.PCG64(5))
        base = rng.integers(0, 50, adj.n).astype(np.int64)
        cv: dict[int, int] = {}
        for lab, v in zip(base, vol):
            cv[int(lab)] = cv.get(int(lab), 0) + int(v)
        la, lb = base.copy(), base.copy()
        cva = dict(cv)
        cvb = dict(cv)
        ma = local_move_sweep(adj, la, vol, cva, w, nodes=np.arange(m, dtype=np.int64))
        mb = local_move_sweep_fast(adj, lb, vol, cvb, w, m)
        assert ma == mb and np.array_equal(la, lb)
        assert cva == cvb
