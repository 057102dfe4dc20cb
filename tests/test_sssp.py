"""Multi-source Bellman-Ford SSSP — Python replay parity, BFS special
case, fixpoint == Dijkstra, sparse reachability, negative-weight guard."""

import pytest

from comm_detect_spark.operators.sssp import sssp
from tests.conftest import edges_df

# weighted digraph: two seeds' frontiers meet; vertex 7 unreachable
EDGES = [
    (0, 1, 4), (0, 2, 1), (2, 1, 1), (1, 3, 2), (2, 3, 7),
    (3, 4, 1), (5, 4, 2), (5, 6, 1), (6, 0, 3), (7, 5, 1),
]


def _py_bf(edges, sources, rounds):
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        new = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < new.get(d, float("inf")):
                new[d] = dist[s] + w
        dist = new
    return dist


def _spark_edges(spark, edges):
    return edges_df(
        spark,
        max(max(s, d) for s, d, _ in edges) + 1,
        [s for s, _, _ in edges],
        [d for _, d, _ in edges],
        [w for _, _, w in edges],
    )


class TestSSSP:
    def test_fixed_rounds_matches_python_replay(self, spark):
        e = _spark_edges(spark, EDGES)
        for rounds in (1, 2, 4):
            got = {
                r["vid"]: r["dist"]
                for r in sssp(spark, e, [0, 5], rounds=rounds).collect()
            }
            assert got == _py_bf(EDGES, [0, 5], rounds), rounds

    def test_fixpoint_matches_converged_distances(self, spark):
        e = _spark_edges(spark, EDGES)
        got = {
            r["vid"]: r["dist"] for r in sssp(spark, e, [0]).collect()
        }
        # converged Bellman-Ford == true shortest distances
        assert got == _py_bf(EDGES, [0], rounds=len(EDGES))
        assert 7 not in got  # unreachable vertices never materialize

    def test_bfs_special_case(self, spark):
        hop_edges = [(s, d, 1) for s, d, _ in EDGES]
        e = _spark_edges(spark, hop_edges)
        got = {
            r["vid"]: r["dist"] for r in sssp(spark, e, [7]).collect()
        }
        assert got == {7: 0, 5: 1, 4: 2, 6: 2, 0: 3, 1: 4, 2: 4, 3: 5}

    def test_parallel_edges_take_min(self, spark):
        e = _spark_edges(spark, [(0, 1, 9), (0, 1, 2)])
        got = {
            r["vid"]: r["dist"] for r in sssp(spark, e, [0], rounds=1).collect()
        }
        assert got == {0: 0, 1: 2}

    def test_negative_weight_raises(self, spark):
        e = _spark_edges(spark, [(0, 1, -3)])
        with pytest.raises(ValueError, match="negative"):
            sssp(spark, e, [0], rounds=1)
