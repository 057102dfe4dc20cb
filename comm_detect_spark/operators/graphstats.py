"""Whole-graph scalar profile: size, density, reciprocity, assortativity.

No single reference twin (the reference prints |V|/|E| ad hoc at load
time); these are the standard first-look diagnostics a
web-graph pipeline computes before heavier kernels — reciprocity and degree
assortativity (Newman, PRL'02) in particular decide hub handling (a
disassortative hub-and-spoke web graph is the skew case every join guard in
this repo is built for).

Everything is built-in JVM aggregation; the result is ONE row assembled by
cross-joining broadcast single-row aggregates — no driver-side collect in
the plan, so the profile composes into larger jobs.

100 TB shape: three edge-sized shuffles total (distinct simple edges,
degree agg, the reciprocity self-join on the reversed key), each
map-side-combined; corr() is Spark's single-pass covariance aggregate.
The reciprocity join is equi on (dst, src) — same skew class as every
other edge join here, AQE-split. Nothing is O(n^2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_profile(edges: DataFrame) -> DataFrame:
    """One row: (n_vertices, n_edges_directed, n_edges_simple, density,
    reciprocity, assortativity), self-loops excluded throughout.

    density       = n_edges_simple / (n * (n-1) / 2)
    reciprocity   = |{(u,v) in E_dir : (v,u) in E_dir}| / |E_dir|
    assortativity = Pearson corr of (deg(u), deg(v)) over the symmetrized
                    simple edge list (Newman's r; each undirected edge
                    contributes both orientations, which symmetrizes the
                    correlation without a half-weight convention).
    Floats round to 6 (cross-engine convention)."""
    d = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    simple = d.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    verts = (
        d.select(F.col("src").alias("vid"))
        .unionAll(d.select(F.col("dst").alias("vid")))
        .distinct()
    )
    sym = simple.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(simple.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )

    nv = verts.agg(F.count(F.lit(1)).alias("n_vertices"))
    md = d.agg(F.count(F.lit(1)).alias("n_edges_directed"))
    ms = simple.agg(F.count(F.lit(1)).alias("n_edges_simple"))
    rec = (
        d.alias("e")
        .join(
            d.alias("r"),
            (F.col("e.src") == F.col("r.dst"))
            & (F.col("e.dst") == F.col("r.src")),
        )
        .agg(F.count(F.lit(1)).alias("n_recip"))
    )
    aso = (
        sym.join(deg.withColumnRenamed("vid", "src"), "src")
        .withColumnRenamed("deg", "deg_u")
        .join(
            deg.select(F.col("vid").alias("dst"), F.col("deg").alias("deg_v")),
            "dst",
        )
        .agg(
            # corr() raises DIVIDE_BY_ZERO under ANSI when a degree series
            # is constant (regular graph); build Pearson from population
            # moments with try_divide so zero variance -> NULL, which is
            # DuckDB corr()'s semantics for the same input
            F.try_divide(
                F.covar_pop(
                    F.col("deg_u").cast("double"),
                    F.col("deg_v").cast("double"),
                ),
                F.stddev_pop(F.col("deg_u").cast("double"))
                * F.stddev_pop(F.col("deg_v").cast("double")),
            ).alias("r_aso")
        )
    )
    return (
        nv.crossJoin(F.broadcast(md))
        .crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(rec))
        .crossJoin(F.broadcast(aso))
        .select(
            "n_vertices",
            "n_edges_directed",
            "n_edges_simple",
            F.round(
                F.col("n_edges_simple")
                / (F.col("n_vertices") * (F.col("n_vertices") - 1) / 2.0),
                6,
            ).alias("density"),
            F.round(F.col("n_recip") / F.col("n_edges_directed"), 6).alias(
                "reciprocity"
            ),
            F.round("r_aso", 6).alias("assortativity"),
        )
    )


def partition_quality(edges: DataFrame, num_partitions: int = 32) -> DataFrame:
    """One row: (num_partitions, n_edges, cut_edges, cut_fraction,
    max_load, avg_load, skew) for modulo vertex partitioning — the
    shuffle-planning diagnostic run BEFORE committing a partition count
    on a new edge table: cut_fraction is the fraction of edges whose
    endpoints land in different partitions (each cut edge is one network
    hop per iteration in every message-passing kernel here), and skew
    (max/avg partition out-degree load) predicts the straggler factor.

    Partition id is pmod(vid, P), not Spark's murmur3 hash partitioner —
    deliberately: the modulo assignment is engine-independent (the DuckDB
    oracle replays it exactly), and for the dense minted vertex ids the
    repo's loaders produce (graph/core.py) modulo IS a uniform
    partitioner. The murmur3 distribution differs per engine and would
    make the diagnostic unreplayable.

    Cost: one scan, two hash aggs (edge-level cut flags, per-partition
    loads), one-row result — safe to run on the full 100 TB table."""
    d = edges.select("src", "dst").distinct()
    p = F.lit(num_partitions)
    flagged = d.select(
        "src",
        (F.pmod(F.col("src"), p) != F.pmod(F.col("dst"), p))
        .cast("int")
        .alias("cut"),
    )
    totals = flagged.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("cut").alias("cut_edges"),
    )
    loads = (
        flagged.groupBy(F.pmod(F.col("src"), p).alias("pid"))
        .agg(F.count(F.lit(1)).alias("load"))
        .agg(
            F.max("load").alias("max_load"),
            F.avg("load").alias("avg_load"),
        )
    )
    return totals.crossJoin(F.broadcast(loads)).select(
        p.cast("int").alias("num_partitions"),
        "n_edges",
        "cut_edges",
        F.round(F.col("cut_edges") / F.col("n_edges"), 6).alias(
            "cut_fraction"
        ),
        "max_load",
        F.round("avg_load", 6).alias("avg_load"),
        F.round(F.col("max_load") / F.col("avg_load"), 6).alias("skew"),
    )

def edge_sample(
    edges: DataFrame, fraction: float, seed: int = 42,
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic hash p-sampling of the edge table (graph
    sparsification for sampled analytics at 100 TB): keep (src, dst) iff
    ``h60('{seed}:{src}:{dst}') % denom < round(fraction * denom)``.
    Membership is a pure function of (edge, seed) — append/re-shard
    stable, replayable in any engine, and both orientations of an edge
    decide independently (callers sampling an undirected graph should
    canonicalize first). One scan, zero shuffles, no Python."""
    from comm_detect_spark.operators.dedup import _h60

    bucket = F.pmod(
        _h60(
            F.concat(
                F.lit(f"{seed}:"),
                F.col("src").cast("string"),
                F.lit(":"),
                F.col("dst").cast("string"),
            )
        ),
        F.lit(denom),
    )
    return edges.where(bucket < F.lit(round(fraction * denom)))


def degree_quantiles(
    edges: DataFrame, qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> DataFrame:
    """(q, deg): exact interpolated quantiles of the simple-graph degree
    distribution — the shape summary a crawl operator reads before
    choosing hub caps / skew salts. percentile() here and quantile_cont
    in the oracle both implement the standard linear-interpolation
    estimator, so values match to rounding (6 dp).

    100 TB note: exact percentile assembles the per-degree histogram on
    one reducer — fine because the DOMAIN is small (distinct degree
    values, not vertices). For a truly unbounded domain switch to
    percentile_approx (t-digest) — same call shape."""
    simple = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        simple.select(F.explode(F.array("a", "b")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    q_arr = ",".join(repr(float(q)) for q in qs)
    # ONE aggregation for every requested quantile (percentile over an
    # array literal), then unpack — not one scan per quantile
    vals = deg.agg(F.expr(f"percentile(deg, array({q_arr}))").alias("v"))
    return vals.select(
        F.posexplode("v").alias("i", "deg_q")
    ).select(
        F.element_at(
            F.array(*[F.lit(float(q)) for q in qs]), F.col("i") + 1
        ).alias("q"),
        F.round("deg_q", 6).alias("deg_q"),
    )

def edge_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(src, dst, status): crawl-to-crawl edge delta — every directed
    edge of old ∪ new classified 'added' (new only), 'removed' (old
    only), or 'kept' (both). Weights ignored; parallel edges collapse
    (distinct). The refresh-analysis primitive: feed 'added' to a
    warm-start PageRank (pagerank.py ``init=``), audit 'removed' for
    link-rot, alert on churn ratios.

    100 TB shape: two left_anti + one semi join on (src, dst) — all
    shuffle-on-key equi-joins with map-side dedup; when both crawls are
    bucketed by src (sources/bucketed.py) every join is exchange-free.
    Never materializes a cross product; output is |old ∪ new| rows."""
    o = old.select("src", "dst").distinct()
    n = new.select("src", "dst").distinct()
    added = n.join(o, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("added").alias("status")
    )
    removed = o.join(n, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("removed").alias("status")
    )
    kept = n.join(o, ["src", "dst"], "semi").select(
        "src", "dst", F.lit("kept").alias("status")
    )
    return added.unionAll(removed).unionAll(kept)


def global_transitivity(edges: DataFrame) -> DataFrame:
    """One row: (wedges, triangles, transitivity) where transitivity is
    the global clustering coefficient 3*T / W (Newman) over the
    symmetrized simple graph (self-loops dropped, parallel edges
    collapsed). Complements clustering_coeff (the per-vertex local
    coefficient): a corpus-level web-graph has low transitivity but a
    heavy local-coefficient tail; the single scalar is the first-look
    triangle-density diagnostic.

    transitivity = 3*T / W, W = sum_v deg(v)*(deg(v)-1)/2; NULL when the
    graph has no wedge (try_divide, DuckDB division-by-zero semantics).

    100 TB shape: the triangle count is the same degree-ordered
    enumeration as triangles_df (each triangle found exactly once from
    its lowest-degree corner — the orientation that keeps the join fan-out
    bounded by arboricity, not by hub degree); the wedge count is one
    map-side-combined degree agg. Two broadcast single-row frames
    assemble the scalar — no driver collect in the plan."""
    from .triangles import triangles_df

    d = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    simple = d.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    sym = simple.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(simple.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    wedges = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
            .cast("bigint")
            .alias("wedges")
        )
    )
    tris = triangles_df(edges).agg(F.count(F.lit(1)).alias("triangles"))
    return wedges.crossJoin(F.broadcast(tris)).select(
        "wedges",
        "triangles",
        F.round(
            F.try_divide(3.0 * F.col("triangles"), F.col("wedges")), 6
        ).alias("transitivity"),
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """(deg, n_vertices, knn): Pastor-Satorras k_nn(k) — for each degree
    class k, the mean over degree-k vertices of their mean neighbor
    degree, on the symmetrized simple graph. The degree-correlation
    profile that graph_profile's single assortativity scalar summarizes:
    a falling knn(k) curve (disassortative hubs linking to leaves) is the
    signature load-imbalance case the skew guards here are built for.

    100 TB shape: degree agg (map-side combined), ONE edge-sized join to
    attach neighbor degrees, per-vertex mean, then a degree-class agg
    whose key cardinality is the distinct-degree count (≤ ~log-scale in
    practice). No window, no Python; output rows = distinct degrees."""
    d = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    simple = d.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    sym = simple.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(simple.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    per_vertex = (
        sym.join(
            deg.select(F.col("vid").alias("dst"), F.col("deg").alias("deg_v")),
            "dst",
        )
        .groupBy(F.col("src").alias("vid"))
        .agg(F.avg(F.col("deg_v").cast("double")).alias("mean_nbr_deg"))
        .join(deg, "vid")
    )
    return (
        per_vertex.groupBy("deg")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.round(F.avg("mean_nbr_deg"), 6).alias("knn"),
        )
        .select("deg", "n_vertices", "knn")
    )
