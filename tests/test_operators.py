"""Spark operators vs the NumPy oracle on the reference's fixture (jazz)
and the planted graphs — the correctness gates of BASELINE.md."""

import numpy as np
import pytest

from comm_detect_spark import oracle
from comm_detect_spark.graph import edges_from_numpy
from comm_detect_spark.operators import (
    connected_components,
    lpa_sync,
    modularity_score,
    pagerank,
    triangle_counts,
)
from comm_detect_spark.operators.triangles import triangle_total


def to_vec(df, n, key="vid", val=None, dtype=np.int64, default=0):
    """Collect a (vid, x) DataFrame into a dense numpy vector."""
    val = val or [c for c in df.columns if c != key][0]
    out = np.full(n, default, dtype=dtype)
    for row in df.collect():
        out[row[key]] = row[val]
    return out


class TestPageRank:
    def test_jazz_allclose(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        got = to_vec(pagerank(spark, jazz_df, n, iterations=10), n, dtype=np.float64)
        want = oracle.pagerank(n, s, d, w.astype(float), iterations=10)
        assert np.allclose(got, want, atol=1e-6)

    def test_salted_identical(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        plain = to_vec(pagerank(spark, jazz_df, n, iterations=5), n, dtype=np.float64)
        salted = to_vec(
            pagerank(spark, jazz_df, n, iterations=5, salt=4), n, dtype=np.float64
        )
        assert np.allclose(plain, salted, atol=1e-9)

    def test_csr_mode_allclose(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        got = to_vec(
            pagerank(spark, jazz_df, n, iterations=5, mode="csr", num_blocks=8),
            n,
            dtype=np.float64,
        )
        want = oracle.pagerank(n, s, d, w.astype(float), iterations=5)
        assert np.allclose(got, want, atol=1e-9)

    def test_dangling_mass(self, spark):
        # 0 -> 1 -> 2, node 2 dangling
        e = edges_from_numpy(spark, 3, [0, 1], [1, 2], [1, 1])
        got = to_vec(pagerank(spark, e, 3, iterations=8), 3, dtype=np.float64)
        want = oracle.pagerank(3, [0, 1], [1, 2], iterations=8)
        assert np.allclose(got, want, atol=1e-9)


class TestConnectedComponents:
    def test_two_components_exact(self, spark):
        n, s, d, w = oracle.two_components(k=4, c=8)
        e = edges_from_numpy(spark, n, s, d, w)
        got = to_vec(connected_components(spark, e, n), n)
        want = oracle.connected_components(
            oracle.Adjacency.from_entries(n, s, d, w)
        )
        assert np.array_equal(got, want)

    def test_jazz_single_component(self, spark, jazz, jazz_df):
        n = jazz[0]
        got = to_vec(connected_components(spark, jazz_df, n), n)
        assert np.all(got == 0)

    def test_giant_component_star_skew(self, spark):
        """Adversarial skew: a star with 10^6 spokes collapses every vertex
        onto comp=0 after round 1, so the pointer-jump probe side carries
        ONE join key. The semi-filtered build side (components.py) lets AQE
        broadcast it instead of shuffling the hot key; this must complete
        quickly and exactly."""
        from pyspark.sql import functions as F

        n = 1_000_001
        spokes = spark.range(1, n).select(
            F.lit(0).cast("bigint").alias("src"),
            F.col("id").alias("dst"),
            F.lit(1).cast("bigint").alias("weight"),
        )
        e = spokes.unionAll(
            spokes.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        out = connected_components(spark, e, n)
        assert out.where(F.col("comp") != 0).count() == 0
        assert out.count() == n


class TestLpaSync:
    def test_jazz_exact(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        got = to_vec(lpa_sync(spark, jazz_df, n), n)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want, _ = oracle.lpa_sync(adj)
        assert np.array_equal(got, want)

    def test_ring_of_cliques(self, spark):
        n, s, d, w = oracle.ring_of_cliques(k=4, c=8)
        e = edges_from_numpy(spark, n, s, d, w)
        got = to_vec(lpa_sync(spark, e, n), n)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want, _ = oracle.lpa_sync(adj)
        assert np.array_equal(got, want)


class TestModularity:
    def test_weighted_triangle_constants(self, spark):
        n, s, d, w = oracle.weighted_triangle()
        e = edges_from_numpy(spark, n, s, d, w)
        labels = spark.createDataFrame(
            [(0, 0), (1, 0), (2, 2)], "vid BIGINT, label BIGINT"
        )
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want = oracle.modularity(adj, np.array([0, 0, 2]))
        assert modularity_score(e, labels) == pytest.approx(want, abs=1e-12)

    def test_jazz_louvain_partition(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        lab, _ = oracle.louvain(adj)
        labels = spark.createDataFrame(
            [(int(i), int(l)) for i, l in enumerate(lab)], "vid BIGINT, label BIGINT"
        )
        assert modularity_score(jazz_df, labels) == pytest.approx(
            oracle.modularity(adj, lab), abs=1e-6
        )


class TestTriangles:
    def test_jazz_total(self, spark, jazz_df):
        assert triangle_total(jazz_df) == 17899

    def test_jazz_per_vertex(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        got = to_vec(triangle_counts(jazz_df), n)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want, _ = oracle.triangle_counts(adj)
        assert np.array_equal(got, want)

    def test_ring_of_cliques_total(self, spark):
        n, s, d, w = oracle.ring_of_cliques(k=4, c=8)
        e = edges_from_numpy(spark, n, s, d, w)
        assert triangle_total(e) == 4 * (8 * 7 * 6 // 6)
