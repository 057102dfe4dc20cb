"""Katz centrality — NumPy replay parity, beta anchoring, dangling
semantics, one-exchange-per-iteration plan assertion."""

import numpy as np
from pyspark.sql import functions as F

from comm_detect_spark.operators.katz import katz
from tests.conftest import edges_df

EDGES = [
    (0, 1, 1), (0, 2, 2), (1, 2, 1), (2, 3, 1), (3, 0, 3), (1, 4, 1),
]
N = 5


def _np_katz(edges, n, iters, alpha, beta):
    A = np.zeros((n, n))
    for s, d, w in edges:
        A[s, d] += w
    x = np.full(n, beta)
    for _ in range(iters):
        x = beta + alpha * (A.T @ x)
    return x


class TestKatz:
    def _edges(self, spark):
        return edges_df(
            spark, N,
            [s for s, _, _ in EDGES],
            [d for _, d, _ in EDGES],
            [w for _, _, w in EDGES],
        )

    def test_matches_numpy_replay(self, spark):
        got = {
            r["vid"]: r["score"]
            for r in katz(
                spark, self._edges(spark), N, iterations=6, alpha=0.1
            ).collect()
        }
        want = _np_katz(EDGES, N, 6, 0.1, 1.0)
        assert got.keys() == set(range(N))
        for v in range(N):
            assert abs(got[v] - want[v]) < 1e-9, v

    def test_source_only_vertex_keeps_beta(self, spark):
        # vertex with no in-edges: score stays exactly beta every round
        e = edges_df(spark, 3, [0, 0], [1, 2], [1, 1])
        got = {
            r["vid"]: r["score"]
            for r in katz(spark, e, 3, iterations=4, beta=2.0).collect()
        }
        assert got[0] == 2.0

    def test_one_exchange_per_iteration(self, spark):
        # iteration body: gather join is exchange-free (edges cached on
        # src, state on vid — alias-tracked partitioning); only the dst
        # agg exchanges. Same contract and counter as the lpa/pagerank
        # plan assertions (live_exchange_count skips cached subtrees).
        from tests.test_plans import live_exchange_count, plan_of

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            P = int(spark.conf.get("spark.sql.shuffle.partitions"))
            e = self._edges(spark).select(
                "src", "dst", F.col("weight").cast("double").alias("w")
            ).repartition(P, "src").persist()
            e.count()
            state = spark.range(N).select(
                F.col("id").alias("vid"), F.lit(1.0).alias("score")
            ).repartition(P, "vid").persist()
            state.count()
            gathered = (
                e.join(
                    state.select(F.col("vid").alias("src"),
                                 F.col("score").alias("s")), "src")
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.sum(F.col("w") * F.col("s")).alias("contrib"))
            )
            new_state = state.select("vid").join(gathered, "vid", "left")
            assert live_exchange_count(plan_of(new_state)) == 1
            e.unpersist()
            state.unpersist()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
