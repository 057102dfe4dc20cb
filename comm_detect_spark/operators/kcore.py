"""k-core decomposition: iterative peeling of vertices with degree < k on
the simple undirected graph.

Web-scale shape: each round is ONE degree aggregation (hash agg over the
surviving adjacency entries) plus an anti-join removing the peeled
vertices' edges. The peel set shrinks geometrically on real graphs and is
usually tiny relative to the edge table, so the anti-join's build side is
small — AQE turns it into a broadcast join at runtime without any manual
hint. Lineage is truncated with localCheckpoint every few rounds (the same
iterative-plan hygiene as pagerank.py; unbounded lineage is the classic
iterative-Spark OOM).

Semantics (matched by the numpy oracle in oracle/algorithms.py::k_core):
degree counts DISTINCT neighbors on the de-duplicated simple graph
(self-loops dropped, weights ignored — standard k-core is structural).
Output is (vid, in_core) over ALL vertices of the simple graph, so the
result is a total classification, not just the survivor list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(vid, in_core): vertices of the maximal subgraph in which every
    vertex has degree >= k. Deterministic (pure function of the graph).
    Raises RuntimeError if peeling has not reached fixpoint within
    ``max_iter`` rounds (e.g. a long path graph peels one layer per
    round) — never returns in_core=True for an undecided vertex."""
    if k < 1:
        raise ValueError(f"k_core needs k >= 1, got {k}")
    simple = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
        )
        .distinct()
    )
    all_verts = (
        simple.select(F.col("x").alias("vid"))
        .unionAll(simple.select(F.col("y").alias("vid")))
        .distinct()
        .persist()
    )
    all_verts.count()
    # both directions so degree is one groupBy(src)
    cur = (
        simple.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .unionAll(simple.select(F.col("y").alias("src"), F.col("x").alias("dst")))
        .persist()
    )
    cur.count()
    for it in range(max_iter):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        peel = deg.where(F.col("deg") < k).select("src").persist()
        n_peel = peel.count()
        if n_peel == 0:
            peel.unpersist()
            break
        nxt = (
            cur.join(peel, "src", "left_anti")
            .join(peel.select(F.col("src").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
        )
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        cur.unpersist()
        peel.unpersist()
        cur = nxt
    else:
        # loop exhausted max_iter without the n_peel == 0 break: verify the
        # survivor set actually reached fixpoint; if any vertex is still
        # sub-k, the result would silently misclassify it as in-core
        # (fail-loud contract, same as scc.py / sssp.py)
        n_sub = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") < k)
            .count()
        )
        if n_sub:
            raise RuntimeError(
                f"k_core: not converged after max_iter={max_iter} "
                f"({n_sub} vertices still below degree {k}); raise max_iter"
            )
    survivors = cur.select(F.col("src").alias("vid")).distinct()
    out = all_verts.join(
        survivors.withColumn("_in", F.lit(True)), "vid", "left"
    ).select("vid", F.coalesce(F.col("_in"), F.lit(False)).alias("in_core"))
    # materialize before releasing the two caches the plan reads (the
    # walks/scc release discipline): vertex-sized, one extra action
    out = out.localCheckpoint(eager=True)
    all_verts.unpersist()
    cur.unpersist()
    return out


def local_clustering(edges: DataFrame) -> DataFrame:
    """(vid, coeff): local clustering coefficient on the simple undirected
    graph — 2 * triangles(v) / (deg(v) * (deg(v) - 1)), 0.0 when deg < 2.
    Rounded to 6 decimals (cross-engine hash stability).

    Reuses the degree-ordered triangle enumeration (triangles.py), so hub
    vertices stay subquadratic; the degree join is vertex-sized.
    """
    from comm_detect_spark.operators.triangles import _simple, triangle_counts

    simple = _simple(edges)
    deg = (
        simple.select(F.explode(F.array("x", "y")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_counts(edges)
    return deg.join(tri, "vid", "left").select(
        "vid",
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("coeff"),
    )

def core_decomposition(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int | None = None,
    max_iter: int = 100,
    checkpoint_every: int = 3,
    driver=None,
    resume: bool = False,
) -> DataFrame:
    """(vid, coreness): per-vertex core number via distributed h-index
    iteration (Montresor, De Pellegrini & Miorandi, "Distributed k-Core
    Decomposition", IEEE TPDS 2013): start from c0(v) = deg(v) and repeat
    c_{t+1}(v) = H({c_t(u) : u in N(v)}) — the h-index of the neighbors'
    current estimates. The sequence is monotone non-increasing per vertex
    and converges exactly to the core number. Complements k_core (the
    single-k membership test): one run yields membership for EVERY k.

    Fixed ``rounds`` keeps the plan static and the intermediate state
    deterministic (the driver-oracle mode — round-t estimates are a pure
    function of the graph); ``rounds=None`` iterates to fixpoint and
    raises RuntimeError if ``max_iter`` is exhausted first (fail-loud,
    same contract as k_core/scc/sssp). With a checkpoint-backed
    ``driver`` (plans/driver.py IterationDriver) and ``resume=True``,
    fixpoint mode continues from the latest snapshot — kill-at-k ==
    uninterrupted, converged-resume is a no-op (the sssp contract).

    Plan shape per round: ONE edge join against the current estimate +
    one hash agg building the sorted neighbor-estimate array, then the
    h-index is a pure JVM zip_with/filter fold — no per-row Python. The
    collect_list per vertex is O(deg) (hub rows are wide but the web
    graph's max degree is bounded by the same hub caps the walk/linkpred
    operators apply upstream); at 100 TB the edge-sized exchange per
    round dominates, identical to one LPA sweep. Lineage cut every
    ``checkpoint_every`` rounds."""
    simple = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
        )
        .distinct()
    )
    sym = (
        simple.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .unionAll(
            simple.select(F.col("y").alias("src"), F.col("x").alias("dst"))
        )
        .persist()
    )
    sym.count()
    from comm_detect_spark.plans.driver import IterationDriver

    drv = driver or IterationDriver(checkpoint_every=checkpoint_every)
    resumed = drv.try_resume(spark) if resume else None
    if resumed is not None:
        cur, start_it, hist = resumed
        if (
            rounds is None
            and int(hist.get(start_it, {}).get("changed", 1)) == 0
        ):
            sym.unpersist()
            out = drv.finish(start_it).select(
                "vid", F.col("c").alias("coreness")
            )
            return out
    else:
        cur = drv.start(
            sym.groupBy(F.col("src").alias("vid")).agg(
                F.count(F.lit(1)).cast("long").alias("c")
            )
        )
        start_it = 0
    # h-index of the DESC-sorted neighbor estimates: the predicate
    # sorted[i-1] >= i is a monotone prefix, so its true-count IS the
    # h-index — one zip_with + filter + size, pure codegen
    hidx = F.size(
        F.filter(
            F.zip_with(
                F.reverse(F.sort_array(F.collect_list("nc"))),
                F.sequence(F.lit(1), F.count(F.lit(1)).cast("int")),
                lambda v, i: v >= i,
            ),
            lambda b: b,
        )
    ).cast("long")
    n_rounds = rounds if rounds is not None else max_iter
    converged = rounds is not None
    it = start_it
    for it in range(start_it + 1, n_rounds + 1):
        nxt = (
            sym.join(
                cur.select(F.col("vid").alias("dst"), F.col("c").alias("nc")),
                "dst",
            )
            .groupBy(F.col("src").alias("vid"))
            .agg(hidx.alias("c2"))
            .join(cur, "vid")
            .select("vid", F.least("c", "c2").alias("c"))
        )
        if rounds is None:
            nxt = drv.prepare(nxt, it)
            changed = (
                nxt.withColumnRenamed("c", "c_new")
                .join(cur, "vid")
                .where(F.col("c_new") != F.col("c"))
                .count()
            )
            cur = drv.install(nxt, it, changed=changed)
            if changed == 0:
                converged = True
                break
        else:
            cur = drv.step(nxt, it, changed=-1)
    if not converged:
        sym.unpersist()
        raise RuntimeError(
            f"core_decomposition: not converged after max_iter={max_iter}; "
            "raise max_iter"
        )
    out = drv.finish(it).select("vid", F.col("c").alias("coreness"))
    sym.unpersist()
    return out


def numpy_coreness(src, dst, rounds: int | None = None):
    """Independent NumPy replay of core_decomposition's contract (h-index
    iteration on the simple graph; rounds=None -> exact core numbers).
    Used by tests and the generated VALUES oracle — the Spark path never
    touches this code."""
    import numpy as np

    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    und = np.unique(np.stack([a, b], axis=1), axis=0)
    s = np.concatenate([und[:, 0], und[:, 1]])
    d = np.concatenate([und[:, 1], und[:, 0]])
    vids = np.unique(s)
    idx = {int(v): i for i, v in enumerate(vids)}
    nbrs: list[list[int]] = [[] for _ in vids]
    for u, v in zip(s, d):
        nbrs[idx[int(u)]].append(idx[int(v)])
    c = np.array([len(ns) for ns in nbrs], dtype=np.int64)

    def h_index(vals):
        vals = sorted(vals, reverse=True)
        h = 0
        for i, v in enumerate(vals, start=1):
            if v >= i:
                h = i
            else:
                break
        return h

    t = 0
    while True:
        t += 1
        new = np.array(
            [min(c[i], h_index([c[j] for j in ns]))
             for i, ns in enumerate(nbrs)],
            dtype=np.int64,
        )
        done = bool((new == c).all())
        c = new
        if rounds is not None and t >= rounds:
            break
        if rounds is None and done:
            break
    return vids, c
