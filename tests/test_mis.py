"""Deterministic Luby MIS — Python replay parity + independence/maximality
invariants on a deterministic random graph."""

import hashlib

from comm_detect_spark.operators.mis import maximal_independent_set
from tests.conftest import edges_df


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_mis(pairs, rounds, seed=42):
    nbrs = {}
    verts = set()
    for s, d in pairs:
        verts.update((s, d))
        if s != d:
            a, b = min(s, d), max(s, d)
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
    pri = {v: (_h60(f"{seed}:{v}"), v) for v in verts}
    state = {}
    undecided = set(verts)
    for _ in range(rounds):
        winners = {
            v
            for v in undecided
            if all(
                pri[v] < pri[u]
                for u in nbrs.get(v, ())
                if u in undecided
            )
        }
        killed = set()
        for w in winners:
            killed |= {u for u in nbrs.get(w, ()) if u in undecided}
        killed -= winners
        for w in winners:
            state[w] = 1
        for u in killed:
            state[u] = 0
        undecided -= winners | killed
    for v in undecided:
        state[v] = -1
    return state


def _rand_graph(n=40, out=3):
    pairs = []
    for v in range(n):
        for j in range(out):
            d = int(hashlib.md5(f"mis:{v}:{j}".encode()).hexdigest()[:8], 16) % n
            pairs.append((v, d))
    return pairs


def _spark_mis(spark, pairs, n, rounds):
    e = edges_df(
        spark, n, [a for a, _ in pairs], [b for _, b in pairs],
        [1] * len(pairs),
    )
    return {
        r["vid"]: r["state"]
        for r in maximal_independent_set(spark, e, rounds=rounds).collect()
    }


class TestMIS:
    def test_path_graph_hand(self, spark):
        pairs = [(0, 1), (1, 2), (2, 3)]
        got = _spark_mis(spark, pairs, 4, rounds=3)
        assert got == _py_mis(pairs, 3)
        # fully decided on a tiny graph, and it is an independent set
        assert -1 not in got.values()
        ins = {v for v, s in got.items() if s == 1}
        for a, b in pairs:
            assert not (a in ins and b in ins)

    def test_matches_python_replay(self, spark):
        pairs = _rand_graph()
        for rounds in (1, 3):
            assert _spark_mis(spark, pairs, 40, rounds) == _py_mis(
                pairs, rounds
            )

    def test_maximality_when_converged(self, spark):
        pairs = _rand_graph(30, 2)
        got = _spark_mis(spark, pairs, 30, rounds=12)
        assert -1 not in got.values(), "12 rounds should decide 30 vertices"
        ins = {v for v, s in got.items() if s == 1}
        nbrs = {}
        for s, d in pairs:
            if s != d:
                nbrs.setdefault(s, set()).add(d)
                nbrs.setdefault(d, set()).add(s)
        # independent
        for a, b in ((a, b) for a in ins for b in nbrs.get(a, ())):
            assert b not in ins
        # maximal: every excluded vertex has an MIS neighbor
        for v, s in got.items():
            if s == 0:
                assert nbrs.get(v, set()) & ins


def test_mis_releases_adjacency_cache(spark, monkeypatch):
    """the persisted adjacency must be unpersisted at return (walks
    cache-release discipline). Tracks persist() calls directly —
    getPersistentRDDs also counts lingering localCheckpoint RDDs, which
    are ContextCleaner-owned and GC-timing dependent."""
    # patch the CONCRETE class: in PySpark 4 the classic DataFrame
    # overrides persist, so patching the pyspark.sql.dataframe base
    # intercepts nothing (a vacuous spy passes any leak)
    import pyspark.sql.classic.dataframe as D

    tracked = []
    orig = D.DataFrame.persist

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        tracked.append(out)
        return out

    monkeypatch.setattr(D.DataFrame, "persist", spy)
    pairs = _rand_graph(20, 2)
    out = _spark_mis(spark, pairs, 20, rounds=6)
    assert out
    assert tracked, "spy never fired — wrong class patched"
    still = [df for df in tracked
             if df.storageLevel.useMemory or df.storageLevel.useDisk]
    # only the returned final state may stay cached
    assert len(still) <= 1, f"{len(still)} frames still persisted"
