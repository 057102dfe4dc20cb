"""Deterministic random walks — Python replay parity, dangling stop,
walks_per_vertex, max_degree cap, sentence assembly."""

import hashlib

from comm_detect_spark.operators.walks import random_walks, walks_as_sentences
from tests.conftest import edges_df


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_walks(edges, walk_length, walks_per_vertex=1, seed=42):
    """Brute-force replay of the operator's contract."""
    nbrs = {}
    verts = set()
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        verts.update((s, d))
    nbrs = {v: sorted(ns) for v, ns in nbrs.items()}
    out = {}
    for v in verts:
        for r in range(walks_per_vertex):
            wid = v * walks_per_vertex + r
            cur = v
            out[(wid, 0)] = cur
            for t in range(1, walk_length + 1):
                ns = nbrs.get(cur)
                if not ns:
                    break
                cur = ns[_h60(f"{seed}:{wid}:{t}") % len(ns)]
                out[(wid, t)] = cur
    return out


def _spark_walks(spark, edges, **kw):
    e = edges_df(
        spark,
        max(max(s, d) for s, d in edges) + 1,
        [s for s, _ in edges],
        [d for _, d in edges],
        [1] * len(edges),
    )
    return random_walks(e, **kw)


EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4), (1, 4)]
# vertex 4 is dangling (no out-edges)


class TestRandomWalks:
    def test_matches_python_replay(self, spark):
        got = {
            (r["walk_id"], r["step"]): r["vid"]
            for r in _spark_walks(spark, EDGES, walk_length=5).collect()
        }
        assert got == _py_walks(EDGES, 5)

    def test_dangling_stops(self, spark):
        got = _py_walks(EDGES, 3)
        # walk from 4 is exactly one row (no out-edges)
        steps4 = [s for (w, s) in got if w == 4]
        assert steps4 == [0]
        spark_rows = {
            (r["walk_id"], r["step"]): r["vid"]
            for r in _spark_walks(spark, EDGES, walk_length=3).collect()
        }
        assert spark_rows == got

    def test_walks_per_vertex(self, spark):
        df = _spark_walks(spark, EDGES, walk_length=2, walks_per_vertex=3)
        got = {
            (r["walk_id"], r["step"]): r["vid"] for r in df.collect()
        }
        assert got == _py_walks(EDGES, 2, walks_per_vertex=3)
        # 5 vertices x 3 reps start rows
        assert sum(1 for (_, s) in got if s == 0) == 15

    def test_max_degree_cap_is_deterministic_subset(self, spark):
        dense = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
        full = _spark_walks(spark, dense, walk_length=4)
        capped = _spark_walks(spark, dense, walk_length=4, max_degree=3)
        fv = {tuple(r) for r in full.collect()}
        cv = {tuple(r) for r in capped.collect()}
        # same run twice -> identical (determinism)
        cv2 = {
            tuple(r)
            for r in _spark_walks(
                spark, dense, walk_length=4, max_degree=3
            ).collect()
        }
        assert cv == cv2
        # every capped step-0 row is a full row; later steps may diverge
        assert {t for t in cv if t[1] == 0} == {t for t in fv if t[1] == 0}

    def test_sentences(self, spark):
        w = _spark_walks(spark, EDGES, walk_length=3)
        sent = {
            r["walk_id"]: list(r["sentence"])
            for r in walks_as_sentences(w).collect()
        }
        py = _py_walks(EDGES, 3)
        for wid in {w for (w, _) in py}:
            steps = sorted(s for (w2, s) in py if w2 == wid)
            assert sent[wid] == [py[(wid, s)] for s in steps]


class TestWeightedWalks:
    def _py_weighted(self, edges, walk_length, seed=42):
        from collections import defaultdict

        w = defaultdict(int)
        verts = set()
        for s, d, wt in edges:
            w[(s, d)] += wt
            verts.update((s, d))
        adj = {}
        for (s, d), wt in sorted(w.items()):
            adj.setdefault(s, []).append((d, wt))
        out = {}
        for v in verts:
            cur = v
            out[(v, 0)] = cur
            for t in range(1, walk_length + 1):
                ns = adj.get(cur)
                if not ns:
                    break
                total = sum(wt for _, wt in ns)
                r = _h60(f"{seed}:{v}:{t}") % total
                acc = 0
                for d, wt in ns:
                    acc += wt
                    if acc > r:
                        cur = d
                        break
                out[(v, t)] = cur
        return out

    def test_matches_python_replay(self, spark):
        from comm_detect_spark.operators.walks import weighted_random_walks

        edges = []
        for v in range(20):
            for j in range(3):
                d = int(
                    hashlib.md5(f"ww:{v}:{j}".encode()).hexdigest()[:8], 16
                ) % 20
                if d != v:
                    edges.append((v, d, 1 + (v * j) % 5))
        e = edges_df(
            spark, 20, [a for a, _, _ in edges], [b for _, b, _ in edges],
            [w for _, _, w in edges],
        )
        got = {
            (r["walk_id"], r["step"]): r["vid"]
            for r in weighted_random_walks(e, walk_length=4).collect()
        }
        assert got == self._py_weighted(edges, 4)

    def test_heavy_edge_dominates(self, spark):
        from comm_detect_spark.operators.walks import weighted_random_walks

        # vertex 0 has nbr 1 (weight 999) and nbr 2 (weight 1): with many
        # walks-per-vertex, nearly every step-1 hop from 0 goes to 1
        e = edges_df(spark, 3, [0, 0], [1, 2], [999, 1])
        rows = weighted_random_walks(
            e, walk_length=1, walks_per_vertex=64
        ).collect()
        hops = [
            r["vid"]
            for r in rows
            if r["step"] == 1 and r["walk_id"] // 64 == 0
        ]
        assert len(hops) == 64
        assert hops.count(1) >= 60
