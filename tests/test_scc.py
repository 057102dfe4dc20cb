"""Strongly connected components: Spark operator vs the Kosaraju oracle.

Covers the algorithm's distinct regimes: trim-only graphs (DAGs), single
giant cycles (pure coloring + pointer jumping), ascending-id SCC chains
(the multi-round worst case), random digraphs at several densities, and
the symmetric-graph identity SCC == CC.
"""

from __future__ import annotations

import numpy as np
import pytest

from comm_detect_spark import oracle
from comm_detect_spark.operators import strongly_connected_components
from comm_detect_spark.oracle.algorithms import (
    strongly_connected_components as scc_oracle,
)


def _run(spark, n, src, dst, **kw):
    e = spark.createDataFrame(
        list(zip(map(int, src), map(int, dst))), "src BIGINT, dst BIGINT"
    )
    got = np.full(n, -1, dtype=np.int64)
    for r in strongly_connected_components(spark, e, n=n, **kw).collect():
        got[r["vid"]] = r["scc"]
    return got


def test_hand_graph(spark):
    # 0->1->2->0 cycle; tendril 2->3->4; 4<->6; isolated 5
    src = [0, 1, 2, 2, 3, 6, 4]
    dst = [1, 2, 0, 3, 4, 4, 6]
    got = _run(spark, 7, src, dst)
    assert got.tolist() == [0, 0, 0, 3, 4, 5, 4]


def test_dag_is_all_singletons_via_trim(spark):
    # a diamond DAG — trim alone must resolve it (no coloring rounds)
    src = [0, 0, 1, 2]
    dst = [1, 2, 3, 3]
    got = _run(spark, 4, src, dst)
    assert got.tolist() == [0, 1, 2, 3]


def test_single_cycle_long(spark):
    n = 64
    src = list(range(n))
    dst = [(i + 1) % n for i in range(n)]
    got = _run(spark, n, src, dst)
    assert (got == 0).all()


def test_ascending_scc_chain_multi_round(spark):
    # three 3-cycles chained by edges in ascending-id order: the coloring
    # collapses everything to color 0 each round, so only one SCC is
    # extracted per outer round — the multi-round path must stay exact
    src, dst = [], []
    for base in (0, 3, 6):
        src += [base, base + 1, base + 2]
        dst += [base + 1, base + 2, base]
    src += [2, 5]
    dst += [3, 6]
    got = _run(spark, 9, src, dst)
    assert got.tolist() == [0, 0, 0, 3, 3, 3, 6, 6, 6]


def test_self_loops_and_duplicates_ignored(spark):
    src = [0, 0, 1, 1, 0]
    dst = [0, 1, 0, 0, 1]
    got = _run(spark, 3, src, dst)
    assert got.tolist() == [0, 0, 2]


@pytest.mark.parametrize("seed,n,m", [(1, 40, 60), (2, 60, 180), (3, 80, 80)])
def test_random_digraph_matches_kosaraju(spark, seed, n, m):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    got = _run(spark, n, src, dst)
    want = scc_oracle(n, src, dst)
    assert np.array_equal(got, want)


def test_symmetric_graph_scc_equals_cc(spark):
    rng = np.random.default_rng(7)
    n, m = 50, 70
    a = rng.integers(0, n, size=m)
    b = rng.integers(0, n, size=m)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    got = _run(spark, n, src, dst)
    w = np.ones_like(src, dtype=np.float64)
    adj = oracle.Adjacency.from_entries(n, src, dst, w)
    want = oracle.connected_components(adj)
    assert np.array_equal(got, want)


def test_vertices_param_with_isolated(spark):
    # explicit vertex table including ids absent from the edge list
    e = spark.createDataFrame([(1, 2), (2, 1)], "src BIGINT, dst BIGINT")
    v = spark.createDataFrame([(0,), (1,), (2,), (9,)], "vid BIGINT")
    got = {
        r["vid"]: r["scc"]
        for r in strongly_connected_components(spark, e, vertices=v).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 9: 9}


def test_max_rounds_raises(spark):
    src = [0, 1, 2, 3, 4, 5, 2, 5]
    dst = [1, 0, 3, 2, 5, 4, 4, 0]  # chain of 2-cycles, descending links
    with pytest.raises(RuntimeError):
        _run(spark, 6, src, dst, max_rounds=1)
