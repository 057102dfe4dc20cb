"""Synchronous label propagation (PLP — plp.cc:72-114, Jacobi variant).

Per sweep (all reads against the previous iteration's frozen labels):

    edges ⋈ state(src)                      -- co-partitioned: NO exchange
      -> repartition(P, dst)                -- THE one edge-sized exchange
      -> groupBy(dst, nbr_label).sum(w)     -- label-weight histogram
         (plp.cc:29-34's atomic hash-map; runs post-shuffle, no exchange:
         hashpartitioning(dst) satisfies clustering on (dst, label))
      -> max_by(struct(s, -label)) per dst  -- argmax, NO sort-based window:
         a single hash agg picks highest sum, ties -> lowest label
         (pins plp.cc:38-40's nondeterministic tie)
      -> adopt if s > 0 (plp.cc:36-37 seeds the argmax with (current, 0))
      -> left join vs state                 -- both vid-partitioned: NO exchange

Shuffle budget: the edge table is cached hash-partitioned on ``src`` with
the SAME partition count P the sweep output carries on ``vid``, so the
per-sweep ``edges ⋈ state`` join and the keep-label join are exchange-free —
exactly ONE edge-sized exchange per sweep (the dst repartition). This is the
minimum for a shuffle-based LPA and the property the scaling bench measures;
tests/test_plans.py asserts the exchange count. On a real cluster the same
effect comes from bucketBy(src) on the edge table (sources/bucketed.py).

Stopping rule is the reference's (plp.cc:90-93): threshold = int(n*eps);
stop when updated <= threshold OR |updated_prev - updated| <= threshold.
The async (Gauss-Seidel) variant lives in lpa_async.py (Arrow-CSR kernel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.graph.core import adaptive_partitions, vertex_range
from comm_detect_spark.plans.driver import IterationDriver


def lpa_step(
    edges: DataFrame, state: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """One synchronous sweep: returns the next (vid, label) state.

    With ``num_partitions`` the histogram input is explicitly repartitioned
    on dst (one exchange), and both aggregations plus the keep-label join
    run exchange-free on that partitioning — provided ``edges`` is cached
    hash-partitioned on src with the same count (see lpa_sync)."""
    # SHUFFLE_HASH hints on both vertex-state joins (r7, guide §3.1): the
    # planner otherwise broadcast-joins the label vector whenever its
    # estimate fits the threshold — a serial driver collect+build+ship of
    # the full vertex state every sweep (and past the threshold it would
    # sort-merge, re-sorting the cached edge table per sweep). The hinted
    # shuffled-hash join keeps the co-partitioned zip join exchange-free
    # and builds the vertex-sized hash map per partition in parallel.
    joined = edges.join(
        state.withColumnRenamed("vid", "src").hint("shuffle_hash"), "src"
    ).select("dst", F.col("label").alias("cand"), "weight")
    if num_partitions:
        joined = joined.repartition(num_partitions, "dst")
    hist = joined.groupBy(F.col("dst").alias("vid"), F.col("cand")).agg(
        F.sum("weight").alias("s")
    )
    # argmax via max_by(struct): highest s, then highest -cand = lowest cand
    best = hist.groupBy("vid").agg(
        F.max(F.struct(F.col("s"), (-F.col("cand")).alias("neg"))).alias("m")
    )
    return state.join(best.hint("shuffle_hash"), "vid", "left").select(
        "vid",
        F.when(
            F.col("m").isNotNull() & (F.col("m.s") > 0), -F.col("m.neg")
        )
        .otherwise(F.col("label"))
        .alias("label"),
    )


def lpa_sync(
    spark: SparkSession,
    edges: DataFrame,
    n: int | None = None,
    eps: float = 1e-4,
    max_iter: int | None = None,
    driver: IterationDriver | None = None,
    vertices: DataFrame | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (vid BIGINT, label BIGINT). Matches oracle.lpa_sync exactly
    (integer weights — the result is partitioning-invariant).

    ``num_partitions`` (default: spark.sql.shuffle.partitions) sizes the
    co-partitioning of the cached edge table and the iterated state.
    ``resume=True`` (requires a driver with a CheckpointStore) restarts from
    the latest snapshot, reseeding the stopping-rule counters from the
    store's per-iteration metrics."""
    drv = driver or IterationDriver()
    if vertices is not None:
        verts = vertices.select("vid").distinct()
        n = verts.count()
    else:
        assert n is not None
        verts = vertex_range(spark, n)
    # scale-adaptive partition count (guide §2): grows with the graph,
    # capped by spark.sql.shuffle.partitions — a 1e3-vertex test graph no
    # longer pays 32 near-empty tasks per stage
    p = adaptive_partitions(spark, n, num_partitions)
    e = edges.repartition(p, "src").persist()
    e.count()
    threshold = int(n * eps)
    resumed = drv.try_resume(spark) if resume else None
    if resumed is not None:
        state, it, hist = resumed
        updated = int(hist.get(it, {}).get("updated", n))
        # at the top of fresh iteration it+1, updated_prev holds iteration
        # it-1's count (n before the first sweep); default n = keep going
        updated_prev = int(hist.get(it - 1, {}).get("updated", n))
    else:
        state = drv.start(
            verts.withColumn("label", F.col("vid")).repartition(p, "vid")
        )
        updated, updated_prev, it = n, 0, 0
    # eps < 0 => threshold < 0 and the stopping rule can NEVER fire
    # (updated >= 0 > threshold, |diff| >= 0 > threshold): the run is
    # governed purely by max_iter, so the per-sweep changed-label count —
    # a second vertex-sized join + count job per sweep whose only purpose
    # is feeding that rule — is pure overhead. Skip it and drive through
    # step() (whose cache-fill action is a plain count of the new state).
    # Resumable runs keep the counting path: the store's per-iteration
    # `updated` metric is what try_resume reseeds the counters from.
    fixed_rounds = threshold < 0 and max_iter is not None and drv.store is None
    while (updated > threshold) and (abs(updated_prev - updated) > threshold):
        if max_iter is not None and it >= max_iter:
            break
        it += 1
        updated_prev = updated
        if fixed_rounds:
            state = drv.step(lpa_step(e, state, num_partitions=p), it)
            continue
        new_state = drv.prepare(lpa_step(e, state, num_partitions=p), it)
        # one action: fills the new state's cache AND counts changed labels
        updated = (
            new_state.withColumnRenamed("label", "l2")
            .join(state, "vid")
            .where(F.col("l2") != F.col("label"))
            .count()
        )
        state = drv.install(new_state, it, updated=updated)
    out = drv.finish(it)
    e.unpersist()
    return out


def seeded_lpa(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """(vid, label) after ``rounds`` synchronous spreads from a FROZEN
    seed set — the discrete cousin of TrustRank (Gyongyi et al., VLDB'04):
    labels (trusted/spam/topic ids) start on a small curated seed set and
    spread along links; a non-seed vertex adopts the weight-majority label
    of its labeled in-neighbors each round (tie -> lowest label), keeps
    its current label when no labeled neighbor speaks, and stays NULL
    until first reached. Seeds never change — the trust anchor.

    Propagation follows edge direction (src endorses dst, the TrustRank
    reading); feed a symmetrized table for undirected spreading.

    100 TB shape: per round ONE edge-sized join + majority agg (map-side
    combined) + a vertex-sized argmax and update join — the lpa_step cost
    shape exactly; early rounds are CHEAPER because only labeled-neighbor
    edges (a seed-sized frontier) survive the inner join. Runs under the
    lineage-truncation IterationDriver."""
    verts = (
        edges.select(F.col("src").alias("vid"))
        .unionAll(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    state0 = verts.join(
        seeds.select("vid", F.col("label").cast("long").alias("label")),
        "vid",
        "left",
    ).select(
        "vid",
        "label",
        F.col("label").isNotNull().alias("is_seed"),
    )
    drv = IterationDriver()
    cur = drv.start(state0)
    for i in range(1, rounds + 1):
        msgs = edges.join(
            cur.where(F.col("label").isNotNull()).select(
                F.col("vid").alias("src"), F.col("label").alias("cand")
            ),
            "src",
        ).select("dst", "cand", "weight")
        if num_partitions:
            msgs = msgs.repartition(num_partitions, "dst")
        hist = msgs.groupBy(F.col("dst").alias("vid"), "cand").agg(
            F.sum("weight").alias("s")
        )
        best = hist.groupBy("vid").agg(
            F.max(
                F.struct(F.col("s"), (-F.col("cand")).alias("neg"))
            ).alias("m")
        )
        nxt = cur.join(best, "vid", "left").select(
            "vid",
            F.when(F.col("is_seed"), F.col("label"))
            .when(F.col("m").isNotNull(), -F.col("m.neg"))
            .otherwise(F.col("label"))
            .alias("label"),
            "is_seed",
        )
        cur = drv.step(nxt, i)
    return cur.select("vid", "label")
