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


class TestNode2VecWalks:
    EDGES_W = [
        (0, 1, 1), (0, 2, 2), (1, 2, 1), (1, 0, 3), (2, 0, 1),
        (2, 3, 1), (3, 4, 2), (1, 4, 1), (4, 0, 1),
    ]

    def _py_n2v(self, edges, L, seed=42, p=1.0, q=1.0, wpv=1):
        from comm_detect_spark.operators.walks import node2vec_class_weights

        w_ret, w_near, w_far = node2vec_class_weights(p, q)
        adj = {}
        verts = set()
        for s, d, w in edges:
            adj.setdefault(s, {})
            adj[s][d] = adj[s].get(d, 0) + w
            verts.update((s, d))
        adj = {v: sorted(m.items()) for v, m in adj.items()}
        out = {}
        for v in sorted(verts):
            for rep in range(wpv):
                wid = v * wpv + rep
                out[(wid, 0)] = v
                u, cur = None, v
                for t in range(1, L + 1):
                    cands = adj.get(cur)
                    if not cands:
                        break

                    def cls(x):
                        if t == 1:
                            return 1
                        if x == u:
                            return w_ret
                        if u in adj and any(d == x for d, _ in adj[u]):
                            return w_near
                        return w_far

                    ws = [(d, w * cls(d)) for d, w in cands]
                    total = sum(w for _, w in ws)
                    r = _h60(f"{seed}:{wid}:{t}") % total
                    acc, nxt = 0, None
                    for d, w in ws:
                        acc += w
                        if nxt is None and acc > r:
                            nxt = d
                    u, cur = cur, nxt
                    out[(wid, t)] = cur
        return out

    def _edges(self, spark):
        return edges_df(
            spark, 5,
            [a for a, _, _ in self.EDGES_W],
            [b for _, b, _ in self.EDGES_W],
            [w for _, _, w in self.EDGES_W],
        )

    def test_class_weights_exact_integers(self):
        from comm_detect_spark.operators.walks import node2vec_class_weights

        # p=a/b, q=c/d -> (bc, ac, ad): ratios are exactly (1/p, 1, 1/q)
        assert node2vec_class_weights(1, 1) == (1, 1, 1)
        assert node2vec_class_weights(0.25, 1) == (4, 1, 1)
        assert node2vec_class_weights(1, 4) == (4, 4, 1)
        assert node2vec_class_weights(2, 0.5) == (1, 2, 4)
        w_ret, w_near, w_far = node2vec_class_weights(0.3, 7)
        assert (w_near / w_ret, w_near / w_far) == (0.3, 7)

    def test_matches_python_replay_across_pq(self, spark):
        from comm_detect_spark.operators.walks import node2vec_walks

        e = self._edges(spark)
        for p, q in [(0.25, 1.0), (2.0, 0.5)]:
            got = {
                (r["walk_id"], r["step"]): r["vid"]
                for r in node2vec_walks(e, 5, p=p, q=q).collect()
            }
            assert got == self._py_n2v(self.EDGES_W, 5, p=p, q=q), (p, q)

    def test_pq_one_is_weighted_walk_identity(self, spark):
        from comm_detect_spark.operators.walks import (
            node2vec_walks,
            weighted_random_walks,
        )

        # p=q=1 collapses every class weight to a constant: bit-identical
        # to the first-order weighted walk (same draws, same ranges)
        e = self._edges(spark)
        a = {
            (r["walk_id"], r["step"]): r["vid"]
            for r in node2vec_walks(e, 4).collect()
        }
        b = {
            (r["walk_id"], r["step"]): r["vid"]
            for r in weighted_random_walks(e, 4).collect()
        }
        assert a == b

    def test_low_p_bounces_back(self, spark):
        from comm_detect_spark.operators.walks import node2vec_walks

        # 0 <-> 1, plus 1 -> 2..5 (unit weights): with w_ret 500x the
        # others, a walk standing on 1 after arriving from 0 returns to 0
        # in the overwhelming majority of draws
        srcs = [0, 1] + [1] * 4
        dsts = [1, 0] + [2, 3, 4, 5]
        e = edges_df(spark, 6, srcs, dsts, [1] * 6)
        rows = node2vec_walks(
            e, walk_length=2, walks_per_vertex=50, p=0.002
        ).collect()
        step2 = {
            r["walk_id"]: r["vid"] for r in rows if r["step"] == 2
        }
        step1 = {
            r["walk_id"]: r["vid"] for r in rows if r["step"] == 1
        }
        # walks that started at 0 all hop to 1 (only edge), then return
        from_zero = [w for w in step1 if w // 50 == 0 and step1[w] == 1]
        assert len(from_zero) == 50
        returned = sum(1 for w in from_zero if step2.get(w) == 0)
        assert returned >= 45  # 1/p = 500 vs 4 competing unit ranges


class TestSkipgramPairs:
    def test_pairs_from_known_walk(self, spark):
        from comm_detect_spark.operators.walks import skipgram_pairs

        # one walk 0-1-2-3, window 2
        rows = [(7, s, v) for s, v in enumerate([0, 1, 2, 3])]
        w = spark.createDataFrame(rows, "walk_id long, step int, vid long")
        got = {
            (r["center"], r["context"]): r["cnt"]
            for r in skipgram_pairs(w, window=2).collect()
        }
        want = {}
        seq = [0, 1, 2, 3]
        for i, c in enumerate(seq):
            for j, x in enumerate(seq):
                if i != j and abs(i - j) <= 2:
                    want[(c, x)] = want.get((c, x), 0) + 1
        assert got == want

    def test_multiplicities_accumulate_across_walks(self, spark):
        from comm_detect_spark.operators.walks import skipgram_pairs

        rows = [(1, 0, 5), (1, 1, 6), (2, 0, 5), (2, 1, 6)]
        w = spark.createDataFrame(rows, "walk_id long, step int, vid long")
        got = {
            (r["center"], r["context"]): r["cnt"]
            for r in skipgram_pairs(w, window=1).collect()
        }
        assert got == {(5, 6): 2, (6, 5): 2}

    def test_no_cross_walk_pairs(self, spark):
        from comm_detect_spark.operators.walks import skipgram_pairs

        rows = [(1, 0, 5), (2, 0, 6)]
        w = spark.createDataFrame(rows, "walk_id long, step int, vid long")
        assert skipgram_pairs(w, window=5).count() == 0
