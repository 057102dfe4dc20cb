"""Jones-Plassmann coloring — Python replay parity, propriety invariant,
monotone progress, isolated/self-loop vertices."""

import hashlib

from comm_detect_spark.operators.coloring import jones_plassmann
from tests.conftest import edges_df


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_jp(edges, rounds, seed=42):
    adj = {}
    verts = set()
    for s, d in edges:
        verts.update((s, d))
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    color = {v: -1 for v in verts}
    pri = {v: (_h60(f"{seed}:{v}"), v) for v in verts}
    for _ in range(rounds):
        winners = [
            v
            for v in verts
            if color[v] < 0
            and all(
                color[u] >= 0 or pri[u] < pri[v] for u in adj.get(v, ())
            )
        ]
        new = dict(color)
        for v in winners:
            used = {color[u] for u in adj.get(v, ()) if color[u] >= 0}
            c = 0
            while c in used:
                c += 1
            new[v] = c
        color = new
    return color


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0), (5, 5), (1, 4),
    (6, 7), (7, 8), (8, 6),
]


class TestColoring:
    def _spark_edges(self, spark, edges):
        return edges_df(
            spark,
            max(max(s, d) for s, d in edges) + 1,
            [s for s, _ in edges],
            [d for _, d in edges],
            [1] * len(edges),
        )

    def test_matches_python_replay(self, spark):
        e = self._spark_edges(spark, EDGES)
        for rounds in (1, 2, 4):
            got = {
                r["vid"]: r["color"]
                for r in jones_plassmann(spark, e, rounds=rounds).collect()
            }
            assert got == _py_jp(EDGES, rounds), rounds

    def test_proper_and_complete_after_enough_rounds(self, spark):
        e = self._spark_edges(spark, EDGES)
        got = {
            r["vid"]: r["color"]
            for r in jones_plassmann(spark, e, rounds=8).collect()
        }
        assert all(c >= 0 for c in got.values())
        for s, d in EDGES:
            if s != d:
                assert got[s] != got[d], (s, d)
        # greedy bound: max color <= max degree
        assert max(got.values()) <= 4

    def test_self_loop_only_vertex_colors_zero(self, spark):
        got = {
            r["vid"]: r["color"]
            for r in jones_plassmann(
                spark, self._spark_edges(spark, [(0, 0), (1, 2)]), rounds=2
            ).collect()
        }
        assert got[0] == 0  # no non-self neighbors: free to take 0

    def test_progress_is_monotone(self, spark):
        e = self._spark_edges(spark, EDGES)
        uncolored = []
        for rounds in (1, 2, 3):
            got = jones_plassmann(spark, e, rounds=rounds).collect()
            uncolored.append(sum(1 for r in got if r["color"] < 0))
        assert uncolored[0] >= uncolored[1] >= uncolored[2]
        assert uncolored[2] < uncolored[0] or uncolored[0] == 0
