"""Arrow-CSR async kernels vs the oracle: single-block runs must be
bit-identical (shared sweep kernel); multi-block runs must be deterministic
and structurally sane."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from comm_detect_spark import oracle
from comm_detect_spark.graph import edges_from_numpy
from comm_detect_spark.operators.louvain import louvain
from comm_detect_spark.operators.lpa_async import lpa_async
from comm_detect_spark.operators.modularity import modularity_score

from tests.test_operators import to_vec


class TestLpaAsync:
    def test_jazz_single_block_exact(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        got = to_vec(lpa_async(spark, jazz_df, n, num_blocks=1), n)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want, _ = oracle.lpa_async(adj)
        assert np.array_equal(got, want)

    def test_jazz_multi_block_deterministic(self, spark, jazz, jazz_df):
        """Blocked async LPA is Jacobi-across/GS-within: labels may differ
        from the sequential oracle (and can oscillate, like the reference's
        racy parallel sweeps) but must be bit-identical across runs."""
        n = jazz[0]
        a = to_vec(lpa_async(spark, jazz_df, n, num_blocks=4, max_iter=6), n)
        b = to_vec(lpa_async(spark, jazz_df, n, num_blocks=4, max_iter=6), n)
        assert np.array_equal(a, b)

    def test_default_num_blocks_is_scale_derived(self, spark, jazz, jazz_df):
        """Library callers who pass no num_blocks must get the size-derived
        block count (shuffle partitions), NOT the one-task parity mode —
        num_blocks=1 serializes the whole graph into a single applyInPandas
        group and is opt-in only."""
        from comm_detect_spark.operators.lpa_async import default_num_blocks

        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert default_num_blocks(spark) == p > 1
        n = jazz[0]
        # defaults == explicit num_blocks=p, and deterministic across runs
        a = to_vec(lpa_async(spark, jazz_df, n, max_iter=3), n)
        b = to_vec(lpa_async(spark, jazz_df, n, num_blocks=p, max_iter=3), n)
        assert np.array_equal(a, b)
        got_df, _ = louvain(spark, jazz_df, n, max_sweeps=2, max_levels=1)
        want_df, _ = louvain(
            spark, jazz_df, n, num_blocks=p, max_sweeps=2, max_levels=1
        )
        assert np.array_equal(to_vec(got_df, n), to_vec(want_df, n))

    def test_frontier_sweeps_output_identical(self, spark, jazz, jazz_df):
        """Active-set sweeps (skip blocks with no changed member/neighbor)
        must equal full sweeps exactly — the skip rule is a proof, not a
        heuristic (lpa_async docstring)."""
        n = jazz[0]
        a = to_vec(
            lpa_async(spark, jazz_df, n, num_blocks=4, frontier=True), n
        )
        b = to_vec(
            lpa_async(spark, jazz_df, n, num_blocks=4, frontier=False), n
        )
        assert np.array_equal(a, b)
        n2, s, d, w = oracle.ring_of_cliques(k=6, c=8)
        e = edges_from_numpy(spark, n2, s, d, w)
        a2 = to_vec(lpa_async(spark, e, n2, num_blocks=8, frontier=True), n2)
        b2 = to_vec(lpa_async(spark, e, n2, num_blocks=8, frontier=False), n2)
        assert np.array_equal(a2, b2)

    def test_ring_of_cliques_single_block_cliques_uniform(self, spark):
        n, s, d, w = oracle.ring_of_cliques(k=4, c=8)
        e = edges_from_numpy(spark, n, s, d, w)
        got = to_vec(lpa_async(spark, e, n, num_blocks=1), n)
        # single-block == oracle: cliques must be label-uniform
        for c in range(4):
            assert len(np.unique(got[c * 8 : (c + 1) * 8])) == 1


class TestLouvain:
    def test_frontier_sweeps_output_identical(self, spark, jazz, jazz_df):
        """Frontier-limited sweeps (skip blocks with no vertex adjacent to a
        touched community) must be OUTPUT-IDENTICAL to full sweeps — the
        skip rule is a proof, not a heuristic (louvain._local_move). Pinned
        on jazz (multi-block: the mode where the frontier actually skips)
        and on a ring of cliques (converges with long quiet tails — the
        frontier's best case)."""
        n = jazz[0]
        a, la = louvain(spark, jazz_df, n, num_blocks=4, frontier=True)
        b, lb = louvain(spark, jazz_df, n, num_blocks=4, frontier=False)
        assert la == lb
        assert np.array_equal(to_vec(a, n), to_vec(b, n))
        n2, s, d, w = oracle.ring_of_cliques(k=6, c=8)
        e = edges_from_numpy(spark, n2, s, d, w)
        a2, _ = louvain(spark, e, n2, num_blocks=8, frontier=True)
        b2, _ = louvain(spark, e, n2, num_blocks=8, frontier=False)
        assert np.array_equal(to_vec(a2, n2), to_vec(b2, n2))

    def test_jazz_single_block_exact(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        got_df, levels = louvain(spark, jazz_df, n, num_blocks=1)
        got = to_vec(got_df, n)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want, want_levels = oracle.louvain(adj)
        assert np.array_equal(got, want)
        assert levels == want_levels

    def test_jazz_modularity_1e6(self, spark, jazz, jazz_df):
        n, s, d, w = jazz
        got_df, _ = louvain(spark, jazz_df, n, num_blocks=1)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want_q = oracle.modularity(adj, oracle.louvain(adj)[0])
        assert modularity_score(jazz_df, got_df) == pytest.approx(
            want_q, abs=1e-6
        )

    def test_ring_of_cliques_exact(self, spark):
        n, s, d, w = oracle.ring_of_cliques(k=4, c=8)
        e = edges_from_numpy(spark, n, s, d, w)
        got_df, _ = louvain(spark, e, n, num_blocks=1)
        got = to_vec(got_df, n)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want, _ = oracle.louvain(adj)
        assert np.array_equal(got, want)

    def test_weighted_graph_exact(self, spark):
        """Weighted edges + a self-loop through the full Spark pipeline
        (volumes count the self-loop twice, dQ excludes self-edges)."""
        n, s, d, w = oracle.weighted_triangle()
        e = edges_from_numpy(spark, n, s, d, w)
        got_df, levels = louvain(spark, e, n, num_blocks=1)
        got = to_vec(got_df, n)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        want, want_levels = oracle.louvain(adj)
        assert np.array_equal(got, want)
        assert levels == want_levels
        assert modularity_score(e, got_df) == pytest.approx(
            oracle.modularity(adj, want), abs=1e-12
        )

    def test_multi_block_quality(self, spark, jazz, jazz_df):
        """Blocked local move is Jacobi-across/GS-within; labels may differ
        from the sequential oracle but the partition quality must hold."""
        n, s, d, w = jazz
        got_df, _ = louvain(spark, jazz_df, n, num_blocks=4, max_sweeps=10)
        adj = oracle.Adjacency.from_entries(n, s, d, w)
        q_oracle = oracle.modularity(adj, oracle.louvain(adj)[0])
        q_got = modularity_score(jazz_df, got_df)
        assert q_got >= q_oracle - 0.05
