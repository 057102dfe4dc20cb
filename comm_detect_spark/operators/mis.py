"""Maximal independent set — deterministic Luby rounds.

No reference twin (SURVEY §2); MIS is the classic symmetry-breaking
primitive of distributed graph processing (Luby, STOC'85) — conflict-free
scheduling, landmark selection, coarsening seeds. The reference's PLP/PLM
break symmetry by asynchronous order (plp.cc:60-104); MIS is the explicit,
provably-parallel version of the same need.

Luby's algorithm with HASH priorities instead of per-round RNG: vertex v's
priority is the pair (h60(seed:v), v) — fixed across rounds, a uniform
random total order that any md5-capable engine reproduces, so the DuckDB
oracle replays every round exactly (same argument as walks.py). One round:

  join   undecided vertex v enters the MIS iff its priority is strictly
         smaller than every undecided neighbor's (local minima of a random
         order — an independent set by construction)
  kill   neighbors of new members become excluded
  loop   on the shrinking undecided remainder

Fixed-priority Luby still terminates (every round the global minimum
undecided vertex always enters), with the same O(log n) expected round
count in practice; determinism is what the correctness gate and resume
story buy with it.

100 TB shape: each round is one edge join (undecided x undecided adjacency,
shuffled on vid) + one vertex agg + one exclusion semi-join — all
equi-joins on vertex id, AQE-split on hub skew. The undecided set shrinks
geometrically (in expectation a constant fraction of edges dies per
round), so round cost decays; lineage is truncated by the caller's driver
loop if run to fixpoint (plans/driver.py pattern, like pagerank)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _h60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(vid, state) after `rounds` deterministic Luby rounds over the
    undirected simple graph of `edges`: state 1 = in the MIS, 0 = excluded
    (a neighbor entered), -1 = still undecided. With enough rounds every
    vertex is decided and the MIS is maximal; a fixed round count keeps
    the driver query's plan static (the oracle unrolls the same rounds).

    Priorities: (h60('{seed}:{vid}'), vid) ascending — strict total order,
    engine-independent."""
    sym = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    # referenced twice per round (undecided-adjacency join + kill join)
    # across all rounds — persist or the distinct/union subplan recomputes
    # 2*rounds times
    adj = sym.select(
        F.col("a").alias("vid"), F.col("b").alias("nbr")
    ).unionAll(
        sym.select(F.col("b").alias("vid"), F.col("a").alias("nbr"))
    ).persist()
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    pri = verts.select(
        "vid",
        _h60(
            F.concat(F.lit(f"{seed}:"), F.col("vid").cast("string"))
        ).alias("p"),
    )

    # single packed state frame (vid, p, state) iterated under the repo's
    # lineage-truncation driver — an unchecked 10-round chain of
    # union/anti-join plans is the classic driver-loop blowup
    # (plans/driver.py docstring)
    from comm_detect_spark.plans.driver import IterationDriver

    drv = IterationDriver()
    cur = drv.start(
        pri.select("vid", "p", F.lit(-1).cast("int").alias("state"))
    )
    for i in range(1, rounds + 1):
        und = cur.where(F.col("state") == -1).select("vid", "p")
        u_adj = adj.join(und.select("vid"), "vid").join(
            und.select(F.col("vid").alias("nbr"), F.col("p").alias("nbr_p")),
            "nbr",
        )
        nbr_min = u_adj.groupBy("vid").agg(
            F.min(F.struct("nbr_p", "nbr")).alias("m")
        )
        winners = (
            und.join(nbr_min, "vid", "left")
            .where(
                F.col("m").isNull()
                | (
                    F.struct(
                        F.col("p").alias("nbr_p"), F.col("vid").alias("nbr")
                    )
                    < F.col("m")
                )
            )
            .select("vid", F.lit(1).alias("win"))
        )
        killed = (
            adj.join(winners.select("vid"), "vid")
            .select(F.col("nbr").alias("vid"))
            .distinct()
            # only currently-undecided neighbors die (an already-excluded
            # neighbor must not flip state again)
            .join(und.select("vid"), "vid")
            .join(winners.select("vid"), "vid", "left_anti")
            .select("vid", F.lit(1).alias("kill"))
        )
        nxt = (
            cur.join(winners, "vid", "left")
            .join(killed, "vid", "left")
            .select(
                "vid",
                "p",
                F.when(F.col("state") != -1, F.col("state"))
                .when(F.col("win") == 1, F.lit(1))
                .when(F.col("kill") == 1, F.lit(0))
                .otherwise(F.lit(-1))
                .cast("int")
                .alias("state"),
            )
        )
        cur = drv.step(nxt, i)
    # cur is materialized (drv.step counts each round), so the adjacency
    # cache has served its purpose — release it rather than leaking
    # executor memory across repeated calls (scc/kcore discipline)
    adj.unpersist()
    return cur.select("vid", "state")
