"""graph_profile — hand-computed micro-fixture + numpy corr cross-check."""

import numpy as np

from comm_detect_spark.operators.graphstats import graph_profile
from tests.conftest import edges_df


def _profile(spark, pairs, n):
    e = edges_df(
        spark, n, [a for a, _ in pairs], [b for _, b in pairs],
        [1] * len(pairs),
    )
    return graph_profile(e).collect()[0]


class TestGraphProfile:
    def test_hand_fixture(self, spark):
        pairs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 1), (0, 2)]
        r = _profile(spark, pairs, 4)
        assert r["n_vertices"] == 4
        assert r["n_edges_directed"] == 6
        assert r["n_edges_simple"] == 5
        assert r["density"] == round(5 / 6, 6)
        assert r["reciprocity"] == round(2 / 6, 6)
        du = [2, 3, 3, 3, 3, 2, 3, 2, 2, 3]
        dv = [3, 2, 3, 3, 2, 3, 2, 3, 3, 2]
        assert r["assortativity"] == round(
            float(np.corrcoef(du, dv)[0, 1]), 6
        )

    def test_self_loops_and_duplicates_ignored(self, spark):
        base = [(0, 1), (1, 2), (2, 0)]
        noisy = base + [(0, 0), (1, 1), (0, 1), (2, 0)]
        a = _profile(spark, base, 3)
        b = _profile(spark, noisy, 3)
        assert tuple(a) == tuple(b)

    def test_star_is_disassortative(self, spark):
        # hub 0 with 5 leaves plus one leaf-leaf edge: hub-leaf edges pair
        # high deg with low deg -> strongly negative assortativity
        pairs = [(0, i) for i in range(1, 6)] + [(1, 2)]
        r = _profile(spark, pairs, 6)
        assert r["assortativity"] < -0.5
        assert r["reciprocity"] == 0.0


class TestPartitionQuality:
    def test_hand_fixture(self, spark):
        from comm_detect_spark.operators.graphstats import partition_quality

        # P=2: parity partitioning. edges (0,2),(1,3) intra; (0,1),(2,3) cut
        pairs = [(0, 2), (1, 3), (0, 1), (2, 3)]
        e = edges_df(
            spark, 4, [a for a, _ in pairs], [b for _, b in pairs],
            [1] * len(pairs),
        )
        r = partition_quality(e, num_partitions=2).collect()[0]
        assert r["n_edges"] == 4 and r["cut_edges"] == 2
        assert r["cut_fraction"] == 0.5
        # out-loads: pid0 holds srcs 0,0,2 -> 3; pid1 holds src 1 -> 1
        assert r["max_load"] == 3 and r["avg_load"] == 2.0
        assert r["skew"] == 1.5

    def test_single_partition_no_cut(self, spark):
        from comm_detect_spark.operators.graphstats import partition_quality

        e = edges_df(spark, 3, [0, 1], [1, 2], [1, 1])
        r = partition_quality(e, num_partitions=1).collect()[0]
        assert r["cut_fraction"] == 0.0 and r["skew"] == 1.0
