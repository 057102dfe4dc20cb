"""k-truss — Python peel replay parity (fixed rounds and fixpoint) plus a
hand fixture where truss < core intuition shows."""

import hashlib

from comm_detect_spark.operators.truss import k_truss
from tests.conftest import edges_df


def _py_truss(pairs, k, rounds=None):
    E = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    r = 0
    while True:
        r += 1
        nbrs = {}
        for a, b in E:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(nbrs[a] & nbrs[b]) for a, b in E
        }
        newE = {e for e in E if sup[e] >= k - 2}
        if rounds is not None:
            if r >= rounds:
                return {e: sup[e] for e in newE}
            E = newE
        else:
            if newE == E:
                return {e: sup[e] for e in newE}
            E = newE


def _spark_truss(spark, pairs, n, k, rounds=None):
    e = edges_df(
        spark, n, [a for a, _ in pairs], [b for _, b in pairs],
        [1] * len(pairs),
    )
    return {
        (r["a"], r["b"]): r["support"]
        for r in k_truss(spark, e, k=k, rounds=rounds).collect()
    }


def _rand_graph(n=26, out=4):
    pairs = []
    for v in range(n):
        for j in range(out):
            d = int(hashlib.md5(f"kt:{v}:{j}".encode()).hexdigest()[:8], 16) % n
            pairs.append((v, d))
    return pairs


class TestKTruss:
    def test_two_triangles_sharing_edge(self, spark):
        # triangles 0-1-2 and 1-2-3 share edge (1,2): its support is 2,
        # the four outer edges have support 1 -> 4-truss (need >= 2) peels
        # the outer edges first, then (1,2) loses its triangles and dies
        pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
        assert _spark_truss(spark, pairs, 4, k=4) == {}
        # 3-truss (need >= 1) keeps everything
        got3 = _spark_truss(spark, pairs, 4, k=3)
        assert got3 == _py_truss(pairs, 3)
        assert got3[(1, 2)] == 2 and got3[(0, 1)] == 1

    def test_k4_clique_survives(self, spark):
        pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        got = _spark_truss(spark, pairs, 4, k=4)
        assert got == {e: 2 for e in pairs}

    def test_fixed_rounds_matches_replay(self, spark):
        pairs = _rand_graph()
        for rounds in (1, 2):
            assert _spark_truss(spark, pairs, 26, k=4, rounds=rounds) == (
                _py_truss(pairs, 4, rounds=rounds)
            )

    def test_fixpoint_matches_replay(self, spark):
        pairs = _rand_graph(20, 5)
        assert _spark_truss(spark, pairs, 20, k=4) == _py_truss(pairs, 4)
