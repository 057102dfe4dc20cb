"""k-source Brandes betweenness — replay parity, exact small cases,
depth cap, determinism of the pivot choice."""

from comm_detect_spark.operators.betweenness import (
    betweenness_approx,
    numpy_betweenness,
)
from tests.conftest import edges_df

EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (2, 4), (4, 0), (1, 4),
    (5, 0), (2, 5),
]


def _spark_edges(spark, edges):
    n = max(max(s, d) for s, d in edges) + 1
    return edges_df(
        spark, n, [s for s, _ in edges], [d for _, d in edges],
        [1] * len(edges),
    )


class TestBetweenness:
    def test_matches_python_replay(self, spark):
        for k in (1, 3, 6):
            got = {
                r["vid"]: r["bc"]
                for r in betweenness_approx(
                    spark, _spark_edges(spark, EDGES), k_sources=k
                ).collect()
            }
            assert got == numpy_betweenness(EDGES, None, k_sources=k), k

    def test_exact_on_directed_path(self, spark):
        # 0->1->2->3 with every vertex a pivot: interior vertices carry
        # the full pair-dependency (bc(1)=bc(2)=2), endpoints none
        e = _spark_edges(spark, [(0, 1), (1, 2), (2, 3)])
        got = {
            r["vid"]: r["bc"]
            for r in betweenness_approx(spark, e, k_sources=4).collect()
        }
        assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}

    def test_star_center_carries_all(self, spark):
        # in-star + out-star around 2: all cross pairs route through it
        e = _spark_edges(spark, [(0, 2), (1, 2), (2, 3), (2, 4)])
        got = {
            r["vid"]: r["bc"]
            for r in betweenness_approx(spark, e, k_sources=5).collect()
        }
        assert got[2] == 4.0  # {0,1} x {3,4}
        assert all(got[v] == 0.0 for v in (0, 1, 3, 4))

    def test_max_depth_caps_paths(self, spark):
        e = _spark_edges(spark, [(0, 1), (1, 2), (2, 3)])
        got = {
            r["vid"]: r["bc"]
            for r in betweenness_approx(
                spark, e, k_sources=4, max_depth=1
            ).collect()
        }
        # depth 1: no multi-hop shortest paths exist, nothing intermediate
        assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}
        assert got == numpy_betweenness(
            [(0, 1), (1, 2), (2, 3)], None, k_sources=4, max_depth=1
        )
