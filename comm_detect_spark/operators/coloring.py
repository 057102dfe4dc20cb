"""Distributed greedy graph coloring — deterministic Jones-Plassmann.

No reference twin (SURVEY §2); coloring is the scheduling primitive of
parallel graph systems — a proper coloring partitions vertices into
conflict-free batches, which is exactly how asynchronous engines (the
reference's PLP/PLM included, plp.cc:60-104) could run "sequential"
updates in parallel waves. Jones-Plassmann (1993) is the standard
distributed greedy: a vertex colors itself the round it holds the highest
priority among its still-uncolored neighbors, taking the smallest color
its already-colored neighbors haven't used.

Priorities are the repo's fixed hash order (h60('{seed}:{vid}'), vid) —
the same replayable symmetry-breaking as MIS (mis.py): a uniform random
total order any md5-capable engine reproduces, so the DuckDB oracle
replays every round exactly and a resumed run colors identically.

One round, all vertex-keyed equi-joins (AQE skew-split on hubs):

  join    uncolored state  x  symmetric adjacency
  agg     per vertex: max uncolored-neighbor priority,
          sorted distinct colored-neighbor colors
  decide  local max  ->  color = mex(used colors)   (one O(deg) fold)

The minimum-excluded-color fold scans the SORTED used-color array: acc
starts 0 and increments exactly when it meets itself — pure higher-order
aggregate, no Python. Uncolored count shrinks every round (the global
priority maximum always wins), expected O(log n) rounds on random orders;
per-round cost decays with the frontier like MIS. Colors are bounded by
degree+1 (greedy bound).

100 TB shape: state is one long per vertex; the per-round shuffle is the
undecided x adjacency join — edge-sized at worst, frontier-sized later;
fixed `rounds` keeps the oracle's plan static, fixpoint mode runs under
the caller's loop on the returned remaining-uncolored count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _h60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def jones_plassmann(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(vid, color) after `rounds` Jones-Plassmann rounds on the
    undirected simple graph of `edges`: color >= 0 once assigned, -1 while
    undecided. Isolated vertices (degree 0) color 0 in round 1. With
    enough rounds every vertex is colored and adjacent vertices always
    differ (propriety is invariant per round, pinned in tests)."""
    sym = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ).where(F.col("src") != F.col("dst"))
        )
        .distinct()
        .select(
            F.col("src").cast("long").alias("a"),
            F.col("dst").cast("long").alias("b"),
        )
        .persist()
    )
    verts = (
        edges.select(F.col("src").cast("long").alias("vid"))
        .unionAll(edges.select(F.col("dst").cast("long").alias("vid")))
        .distinct()
    )
    state = verts.select(
        "vid", F.lit(-1).cast("long").alias("color")
    ).persist()
    state.count()

    pri_a = F.struct(
        _h60(F.concat(F.lit(f"{seed}:"), F.col("a").cast("string"))).alias(
            "h"
        ),
        F.col("a").alias("v"),
    )

    for _ in range(rounds):
        # neighbor view: for each vertex b, its neighbors a with a's state
        nbr = sym.join(
            state.select(F.col("vid").alias("a"), F.col("color").alias(
                "a_color"
            )),
            "a",
        )
        agg = nbr.groupBy(F.col("b").alias("vid")).agg(
            F.max(
                F.when(F.col("a_color") < 0, pri_a)
            ).alias("max_unc_pri"),
            F.sort_array(
                F.collect_set(
                    F.when(F.col("a_color") >= 0, F.col("a_color"))
                )
            ).alias("used"),
        )
        my_pri = F.struct(
            _h60(
                F.concat(F.lit(f"{seed}:"), F.col("vid").cast("string"))
            ).alias("h"),
            F.col("vid").alias("v"),
        )
        # mex fold over the sorted distinct used colors
        mex = F.aggregate(
            F.coalesce("used", F.array().cast("array<long>")),
            F.lit(0).cast("long"),
            lambda acc, u: F.when(u == acc, acc + 1).otherwise(acc),
        )
        wins = (
            F.col("max_unc_pri").isNull() | (my_pri > F.col("max_unc_pri"))
        )
        new_state = (
            state.join(agg, "vid", "left")
            .select(
                "vid",
                F.when(F.col("color") >= 0, F.col("color"))
                .when(
                    F.col("max_unc_pri").isNull()
                    & F.col("used").isNull(),
                    F.lit(0),  # isolated vertex: no neighbors at all
                )
                .when(wins, mex)
                .otherwise(F.lit(-1))
                .alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = new_state
    sym.unpersist()
    return state
