"""Approximate neighborhood function (ANF) via Flajolet-Martin bit sketches.

The reference engine has no ANF kernel; this extends the web-graph analytics
surface (SURVEY Table C) with the classic effective-diameter estimator:
N(h) = #pairs (u, v) with dist(u, v) <= h (Palmer et al., KDD'02 "ANF";
HyperANF, Boldi et al. WWW'11, swaps the bitmask for HyperLogLog — we keep
the original FM bitmask because its union is bitwise OR, which is EXACTLY
reproducible cross-engine, so even the *approximation* is hash-matchable
against a DuckDB oracle).

Determinism contract (shared with the dedup family, dedup.py:37):

    h(v, t)   = 60-bit md5 prefix of "<vid>:<trial>"
                  Spark:  conv(substring(md5(s), 1, 15), 16, 10)::bigint
                  DuckDB: CAST(CONCAT('0x', SUBSTRING(md5(s),1,15)) AS BIGINT)
    sketch(v) = h & -h          -- lowest-set-bit mask: bit r is set with
                                -- probability 2^-(r+1), exactly the FM
                                -- geometric distribution; no bit-position
                                -- loop, no float
    union     = bitwise OR      -- bit_or aggregate, JVM-side, map-side
                                -- combined in both engines
    R(s)      = (-1 - s) & (s + 1)   -- lowest UNSET bit as a power of two
                                -- (two's-complement identity, -1 - s == ~s);
                                -- E[R] = 0.77351 * |neighborhood|
    b(s)      = round(log2(R))  -- exact: R is a power of two, round()
                                -- absorbs the <1 ulp libm difference

After k propagation rounds sk[v] is the FM sketch of the k-hop in-neighborhood
of v (v included).  The driver-checked output is the INTEGER column
b_sum = sum over trials of b(s) — floats only appear in the (pytest-gated)
estimate helpers.

100 TB shape: state is (vid, trial, int64) = trials x vertex-table, and every
round is ONE edge-sized shuffle with map-side bit_or combine — exactly the
cost shape of one connected-components round (components.py:25).  hops is
small (web-graph effective diameter ~ 6-20), so total cost ~ hops PageRank
iterations.  No per-row Python anywhere on this path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# E[2^b] correction constant from Flajolet-Martin (phi)
FM_PHI = 0.77351


def fm_sketch_init(vertices: DataFrame, trials: int = 4) -> DataFrame:
    """(vid) -> (vid, trial, sketch): trial-replicated lowest-set-bit masks.

    One narrow projection + explode; no shuffle."""
    t = F.explode(
        F.array(*[F.lit(i) for i in range(trials)])
    ).alias("trial")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("vid").cast("string"),
                    F.lit(":"),
                    F.col("trial").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        vertices.select("vid", t)
        .withColumn("sketch", h)
        .withColumn("sketch", F.expr("sketch & -sketch"))
    )


def anf_sketches(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    hops: int,
    trials: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """FM sketches of every vertex's hops-hop in-neighborhood.

    Returns (vid BIGINT, trial INT, sketch BIGINT).  Edges propagate
    src -> dst each round (feed a symmetrized edge table for undirected
    semantics).  Same co-partitioning contract as connected_components:
    edges cached hash(src, P), state on hash(vid, P) — the per-round join
    is exchange-free on the state side; only the dst bit_or aggregation
    (map-side combined) shuffles edge-sized."""
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = edges.select("src", "dst").repartition(p, "src").persist()
    e.count()
    sk = (
        fm_sketch_init(vertices.select("vid"), trials)
        .repartition(p, "vid")
        .persist()
    )
    sk.count()
    for it in range(hops):
        nbr = (
            e.join(sk.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"), "trial")
            .agg(F.bit_or("sketch").alias("nsk"))
        )
        new_sk = sk.join(nbr, ["vid", "trial"], "left").select(
            "vid",
            "trial",
            F.expr("sketch | coalesce(nsk, CAST(0 AS BIGINT))").alias(
                "sketch"
            ),
        )
        # hops is small and bounded; persist each round and cut lineage on
        # the same cadence as the other iterative drivers (repo-tuning: >3
        # chained rounds of join+agg start to bloat the plan)
        new_sk = new_sk.repartition(p, "vid")
        if (it + 1) % 3 == 0:
            new_sk = new_sk.localCheckpoint(eager=False)
        new_sk = new_sk.persist()
        new_sk.count()
        sk.unpersist()
        sk = new_sk
    e.unpersist()
    return sk


def anf_b_sum(sketches: DataFrame) -> DataFrame:
    """(vid, trial, sketch) -> (vid BIGINT, b_sum BIGINT).

    b = index of the lowest UNSET bit, extracted with pure int64 arithmetic
    ((-1 - s) & (s + 1) is the power-of-two mask) so the driver's value-hash
    compares integers, not floats."""
    b = F.round(
        F.log2(F.expr("(-1 - sketch) & (sketch + 1)"))
    ).cast("bigint")
    return (
        sketches.groupBy("vid")
        .agg(F.sum(b).alias("b_sum"))
        .select("vid", "b_sum")
    )


def anf_estimates(sketches: DataFrame, trials: int) -> DataFrame:
    """Per-vertex neighborhood-size estimate: 2^(mean b) / phi.

    Float path — pytest-gated, not driver-hashed (cross-engine pow() of a
    non-integer exponent is not bit-stable)."""
    b = F.round(
        F.log2(F.expr("(-1 - sketch) & (sketch + 1)"))
    ).cast("bigint")
    return (
        sketches.groupBy("vid")
        .agg(F.sum(b).alias("b_sum"))
        .select(
            "vid",
            (
                F.pow(F.lit(2.0), F.col("b_sum") / F.lit(float(trials)))
                / F.lit(FM_PHI)
            ).alias("est_size"),
        )
    )


def neighborhood_function(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    max_hops: int,
    trials: int = 32,
    num_partitions: int | None = None,
) -> list[tuple[int, float]]:
    """[(h, N_hat(h))] for h = 1..max_hops, N_hat = sum of per-vertex
    estimates (#ordered pairs within distance h, self-pairs included).

    One sketch pipeline, one scalar agg per hop — the per-hop result is a
    single driver-side float, so the collect is O(max_hops)."""
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = edges.select("src", "dst").repartition(p, "src").persist()
    e.count()
    sk = (
        fm_sketch_init(vertices.select("vid"), trials)
        .repartition(p, "vid")
        .persist()
    )
    sk.count()
    out: list[tuple[int, float]] = []
    for h in range(1, max_hops + 1):
        nbr = (
            e.join(sk.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"), "trial")
            .agg(F.bit_or("sketch").alias("nsk"))
        )
        new_sk = (
            sk.join(nbr, ["vid", "trial"], "left")
            .select(
                "vid",
                "trial",
                F.expr("sketch | coalesce(nsk, CAST(0 AS BIGINT))").alias(
                    "sketch"
                ),
            )
            .repartition(p, "vid")
        )
        if h % 3 == 0:
            new_sk = new_sk.localCheckpoint(eager=False)
        new_sk = new_sk.persist()
        total = (
            anf_estimates(new_sk, trials)
            .agg(F.sum("est_size").alias("n"))
            .collect()[0]["n"]
        )
        out.append((h, float(total)))
        sk.unpersist()
        sk = new_sk
    sk.unpersist()
    e.unpersist()
    return out


def effective_diameter(
    nf: list[tuple[int, float]], q: float = 0.9
) -> float:
    """Interpolated q-effective diameter from a neighborhood function
    (smallest h where N(h) >= q * N(max), linear between hops — the
    standard ANF/HyperANF definition).  Driver-side on the tiny nf list."""
    if not nf:
        return 0.0
    target = q * nf[-1][1]
    prev_h, prev_n = 0, 0.0
    for h, n in nf:
        if n >= target:
            if n == prev_n:
                return float(h)
            # linear interpolation between (prev_h, prev_n) and (h, n)
            return prev_h + (target - prev_n) / (n - prev_n) * (h - prev_h)
        prev_h, prev_n = h, n
    return float(nf[-1][0])


def anf_hop_b_sums(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    hops: int,
    trials: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """(vid BIGINT, hop INT, b_sum BIGINT) for hop = 1..hops — the per-hop
    FM neighborhood profile. Same propagation as anf_sketches, but the
    integer b_sum is captured after EVERY round instead of only the last,
    so the whole distance profile (the input to harmonic/closeness
    centrality) is driver-hashable cross-engine. Cost is identical to
    anf_sketches plus one map-side-combined agg per hop."""
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = edges.select("src", "dst").repartition(p, "src").persist()
    e.count()
    sk = (
        fm_sketch_init(vertices.select("vid"), trials)
        .repartition(p, "vid")
        .persist()
    )
    sk.count()
    out = None
    for h in range(1, hops + 1):
        nbr = (
            e.join(sk.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"), "trial")
            .agg(F.bit_or("sketch").alias("nsk"))
        )
        new_sk = (
            sk.join(nbr, ["vid", "trial"], "left")
            .select(
                "vid",
                "trial",
                F.expr("sketch | coalesce(nsk, CAST(0 AS BIGINT))").alias(
                    "sketch"
                ),
            )
            .repartition(p, "vid")
        )
        if h % 3 == 0:
            new_sk = new_sk.localCheckpoint(eager=False)
        new_sk = new_sk.persist()
        new_sk.count()
        sk.unpersist()
        sk = new_sk
        # materialize the hop's b_sum rows BEFORE the next round unpersists
        # the sketch frame they read — otherwise evaluating the final union
        # recomputes up to 2 propagation rounds for every hop off the
        # every-3 checkpoint cadence (ADVICE r5). One vertex-sized
        # checkpoint per hop, so the advertised "anf_sketches + one agg
        # per hop" cost now actually holds.
        hop_b = anf_b_sum(sk).select(
            "vid", F.lit(h).cast("int").alias("hop"), "b_sum"
        ).localCheckpoint(eager=True)
        out = hop_b if out is None else out.unionAll(hop_b)
    e.unpersist()
    sk.unpersist()
    return out.select("vid", "hop", "b_sum")


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    max_hops: int,
    trials: int = 32,
    num_partitions: int | None = None,
) -> DataFrame:
    """(vid, harmonic): approximate harmonic centrality
    H(v) = sum over u != v of 1/d(u, v), estimated from the FM profile as
    sum_h (N_hat_h(v) - N_hat_{h-1}(v)) / h — HyperANF's centrality recipe
    (Boldi & Vigna, WWW'11) on FM sketches. Sketches only ever gain bits,
    so N_hat is monotone per vertex and every difference term is >= 0.

    Float path: pytest-gated against the exact pure-Python FM simulation
    (the ANF testing convention), not driver-hashed — 2^(b/t) is not
    bit-stable cross-engine. Edges propagate src -> dst; feed a
    symmetrized table for undirected semantics."""
    profile = anf_hop_b_sums(
        spark, edges, vertices, max_hops, trials, num_partitions
    )
    est = profile.select(
        "vid",
        "hop",
        (
            F.pow(F.lit(2.0), F.col("b_sum") / F.lit(float(trials)))
            / F.lit(FM_PHI)
        ).alias("est"),
    )
    # hop-0 estimate: the self-only sketch has exactly bit h&-h set per
    # trial; its expected b is ~0-biased the same way as every later hop,
    # so we subtract the MEASURED hop-0 estimate, not the ideal 1.0 —
    # differential use cancels the FM bias (the ANF paper's argument)
    init = fm_sketch_init(vertices.select("vid"), trials)
    est0 = init.groupBy("vid").agg(
        F.sum(
            F.round(F.log2(F.expr("(-1 - sketch) & (sketch + 1)"))).cast(
                "bigint"
            )
        ).alias("b_sum")
    ).select(
        "vid",
        F.lit(0).cast("int").alias("hop"),
        (
            F.pow(F.lit(2.0), F.col("b_sum") / F.lit(float(trials)))
            / F.lit(FM_PHI)
        ).alias("est"),
    )
    allest = est0.unionAll(est)
    w = Window.partitionBy("vid").orderBy("hop")
    diffs = allest.select(
        "vid",
        "hop",
        (F.col("est") - F.lag("est", 1).over(w)).alias("gain"),
    ).where(F.col("hop") > 0)
    return diffs.groupBy("vid").agg(
        F.sum(F.col("gain") / F.col("hop")).alias("harmonic")
    )


def windowed_distinct_b_sums(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    trials: int = 4,
) -> DataFrame:
    """(hour_epoch BIGINT, b_sum BIGINT): Flajolet-Martin approximate
    DISTINCT-key count per hour window, reduced to the integer b_sum (sum
    over trials of the lowest-unset-bit index) — the same
    engine-independent reduction as anf_b_sum, so the APPROXIMATION itself
    is driver-hashable. est ~= 2^(b_sum/trials)/phi (anf_estimates'
    float path, pytest-gated).

    This is the sketch answer to "distinct users per window" at 100 TB:
    exact distinct is a full shuffle of every key; the sketch is ONE
    map-side-combined bit_or agg with state = trials x int64 per open
    window — and because bit_or is commutative/idempotent the identical
    aggregation runs under Structured Streaming (windowed_distinct_stream)
    with watermark-bounded state. Same md5('{key}:{trial}') seeding as
    fm_sketch_init."""
    tr = F.explode(
        F.sequence(F.lit(0), F.lit(trials - 1))
    ).alias("trial")
    ev = events.select(
        F.unix_timestamp(F.date_trunc("hour", F.col(ts_col)))
        .cast("bigint")
        .alias("hour_epoch"),
        F.col(key_col).cast("string").alias("k"),
        tr,
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("k"), F.lit(":"), F.col("trial").cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    sketched = ev.select(
        "hour_epoch", "trial", h.alias("hh")
    ).select(
        "hour_epoch", "trial", F.expr("hh & -hh").alias("bit")
    )
    per_trial = sketched.groupBy("hour_epoch", "trial").agg(
        F.bit_or("bit").alias("sketch")
    )
    b = F.round(
        F.log2(F.expr("(-1 - sketch) & (sketch + 1)"))
    ).cast("bigint")
    return per_trial.groupBy("hour_epoch").agg(
        F.sum(b).alias("b_sum")
    )


def effective_diameter_df(
    profile: DataFrame, trials: int, q: float = 0.9
) -> DataFrame:
    """One row (eff_diameter DOUBLE): the ANF effective diameter — the
    (interpolated) hop at which the neighborhood function reaches ``q``
    of its final value (Palmer/Gibbons/Faloutsos, KDD'02; the number
    quoted by every web-graph measurement paper) — the all-DataFrame
    twin of :func:`effective_diameter` (same interpolation contract:
    hop-0 anchor (0, 0.0), target = q * N at the LAST hop, plateau
    returns the hop itself), so the whole estimate composes into a
    larger job with no driver collect. Input is an anf_hop_b_sums
    profile; N_hat(h) = sum over vertices of 2^(b_sum/trials)/phi.

    Plan: ONE hash agg to per-hop totals (rows = hops, an operator
    constant), then a window lag over those few rows + a limit. Float
    path (2^x is not bit-stable cross-engine), so pytest-gated against
    the driver-side helper rather than driver-hashed — the ANF testing
    convention (see harmonic_centrality)."""
    from pyspark.sql import Window

    est = F.pow(
        F.lit(2.0), F.col("b_sum") / F.lit(float(trials))
    ) / F.lit(FM_PHI)
    nf = profile.groupBy("hop").agg(F.sum(est).alias("nf"))
    final = nf.select(F.max_by("nf", "hop").alias("nf_final"))
    w = Window.orderBy("hop")
    # rows = hops (tiny); the global window over them is deliberate
    stepped = (
        nf.crossJoin(F.broadcast(final))
        .withColumn("nf_prev", F.coalesce(F.lag("nf").over(w), F.lit(0.0)))
        .withColumn(
            "hop_prev", F.coalesce(F.lag("hop").over(w), F.lit(0))
        )
    )
    bar = F.lit(float(q)) * F.col("nf_final")
    hit = stepped.where(F.col("nf") >= bar).orderBy("hop").limit(1)
    return hit.select(
        F.round(
            F.when(
                F.col("nf") == F.col("nf_prev"),
                F.col("hop").cast("double"),
            ).otherwise(
                F.col("hop_prev")
                + (bar - F.col("nf_prev"))
                / (F.col("nf") - F.col("nf_prev"))
                * (F.col("hop") - F.col("hop_prev"))
            ),
            6,
        ).alias("eff_diameter")
    )
