"""Connected components: iterative min-label propagation with pointer
jumping (SURVEY Table C — component id = min vid in component, exact).

Per round, over adjacency entries (both directions present):

    nbr_min  = edges ⋈ comp(src) -> groupBy(dst).min      -- hash agg
    comp'    = min(comp, nbr_min)
    comp''   = comp' ⋈ comp'  (pointer jump: comp[comp])   -- vertex-sized join

Pointer jumping gives O(log d) rounds on diameter-d graphs — the difference
between ~10 and ~1000 shuffles on a web graph. The heavyweight per-round
work (edge-sized join+agg) is the same shape as one PageRank step, so the
same skew/AQE story applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.graph.core import adaptive_partitions, vertex_range
from comm_detect_spark.plans.driver import IterationDriver


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    n: int | None = None,
    max_iter: int = 50,
    driver: IterationDriver | None = None,
    vertices: DataFrame | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    rounds: int | None = None,
    init: DataFrame | None = None,
) -> DataFrame:
    """Returns (vid BIGINT, comp BIGINT), comp = min vid in component.

    ``init``: optional (vid, comp) warm-start labeling from a previous
    crawl's run. SOUND FOR ADDITIVE DELTAS ONLY (new vertices, new
    edges — the crawl-refresh case edge_diff's 'added' stream feeds):
    every vertex starts at least(vid, old comp), so the fixpoint is
    min over the component of {vids} ∪ {old labels} = the exact min
    vid (old labels are themselves component-member vids), reached in
    rounds proportional to the DELTA's reach, not the diameter. Edge
    REMOVALS can split components; a split piece would keep the merged
    label — run cold after removals (the operator cannot see them).
    Stale labels (vertices gone from ``vertices``) are filtered out, so
    a pruned crawl degrades to cold-start propagation for the affected
    vertices instead of emitting dangling component ids. Ignored on
    resume (the checkpoint state wins).

    Same co-partitioning contract as lpa_sync: edges cached hash(src, P),
    iterated comp state on hash(vid, P) — the per-round join is
    exchange-free, only the dst min-aggregation (map-side combined)
    shuffles edge-sized.

    ``rounds=k`` runs exactly k rounds (early stop on convergence, never
    raises — the oracle-twin mode, sssp.py convention); default fixpoint
    mode raises RuntimeError if labels are still moving after
    ``max_iter`` rounds rather than returning a silently-partial
    labeling."""
    drv = driver or IterationDriver()
    if rounds is not None:
        max_iter = rounds
    if vertices is not None:
        verts = vertices.select("vid").distinct().persist()
        n = verts.count()
    else:
        assert n is not None
        verts = vertex_range(spark, n)
    # scale-adaptive partition count (guide §2): grows with the graph,
    # capped by spark.sql.shuffle.partitions — tiny graphs stop paying 32
    # near-empty tasks per round (the vertex count costs one agg job when
    # an explicit vertex table is passed; it buys every round back)
    p = adaptive_partitions(spark, n, num_partitions)
    e = edges.select("src", "dst").repartition(p, "src").persist()
    e.count()

    resumed = drv.try_resume(spark) if resume else None
    if resumed is not None:
        comp, start_it, hist = resumed
        if int(hist.get(start_it, {}).get("changed", 1)) == 0:
            e.unpersist()
            if vertices is not None:
                verts.unpersist()
            return drv.finish(start_it)
    elif init is not None:
        # warm start: least(vid, old label), stale labels dropped (see
        # docstring — additive-delta contract)
        live = init.join(
            verts.select(F.col("vid").alias("comp")), "comp", "semi"
        ).select("vid", F.col("comp").alias("_ic"))
        comp = drv.start(
            verts.join(live, "vid", "left")
            .select(
                "vid",
                F.least(
                    F.col("vid"), F.coalesce("_ic", F.col("vid"))
                ).alias("comp"),
            )
            .repartition(p, "vid")
        )
        start_it = 0
    else:
        comp = drv.start(
            verts.withColumn("comp", F.col("vid")).repartition(p, "vid")
        )
        start_it = 0
    it = start_it
    for it in range(start_it + 1, max_iter + 1):
        # SHUFFLE_HASH hints (r7, guide §3.1): keep the co-partitioned zip
        # joins exchange-free without per-round driver broadcasts of the
        # component state (and without sort-merge re-sorting the cached
        # edge table past the broadcast threshold). The pointer-jump join
        # below deliberately keeps the AQE-broadcast design instead.
        nbr_min = (
            e.join(
                comp.withColumnRenamed("vid", "src").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        merged = comp.join(nbr_min.hint("shuffle_hash"), "vid", "left").select(
            "vid",
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer jump: comp <- comp[comp] (labels only shrink). SKEW NOTE:
        # the probe side concentrates the giant component's id on one join
        # key (a web graph's largest CC is most of the graph). Two guards:
        # (1) the build side is semi-filtered to ids that are actually some
        # vertex's comp — the distinct-comp set shrinks every round, so the
        # build side quickly drops under the broadcast threshold and AQE
        # turns the jump into a broadcast join (NO exchange of the skewed
        # probe side at all); (2) until then, AQE skew-join splitting
        # (spark.sql.adaptive.skewJoin, on in session.py) splits the hot
        # partition. Same story as pagerank's salted hub aggregation.
        needed = merged.select("comp").distinct()
        jump = merged.alias("a").join(
            merged.select(
                F.col("vid").alias("comp"), F.col("comp").alias("jcomp")
            )
            .join(needed, "comp", "semi")
            .alias("b"),
            "comp",
            "left",
        )
        new_comp = jump.select(
            "vid",
            F.least(F.col("comp"), F.coalesce(F.col("jcomp"), F.col("comp"))).alias(
                "comp"
            ),
        )
        new_comp = drv.prepare(new_comp, it)
        # one action: fills the cache AND counts changed component ids
        changed = (
            new_comp.withColumnRenamed("comp", "c2")
            .join(comp, "vid")
            .where(F.col("c2") != F.col("comp"))
            .count()
        )
        comp = drv.install(new_comp, it, changed=changed)
        if changed == 0:
            break
    else:
        # fail-loud contract (scc/sssp/kcore discipline): with pointer
        # jumping the label frontier at least doubles per round, so 50
        # rounds covers any graph of diameter < 2^50 — exhausting the
        # budget with labels still moving means something is wrong, and a
        # silently-partial labeling is indistinguishable from a correct
        # one. Fixed-rounds mode (rounds=k) is exempt by request.
        if rounds is None and it > start_it and changed > 0:
            raise RuntimeError(
                f"connected_components: labels still changing ({changed} "
                f"vertices) after max_iter={max_iter} rounds; raise max_iter"
            )
    out = drv.finish(it)
    e.unpersist()
    if vertices is not None:
        verts.unpersist()
    return out
