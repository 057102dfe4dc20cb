"""End-to-end corpus deduplication — the composition a training-data
pipeline actually runs, built from this engine's own primitives:

    exact-dup edges (content-hash groups)      operators/dedup.py
  ∪ minhash-LSH candidate pair edges           operators/dedup.py
  -> near-dup GRAPH -> connected components    operators/components.py
  -> cluster id = min doc id in the component
  -> keep = cluster representative AND quality >= threshold
                                               functions/text.py

The near-dup relation is not transitive (A~B, B~C does not imply A~C), so
clustering it is a graph problem; reusing the min-label-propagation CC
operator means the dedup pipeline inherits its scale story (pointer
jumping, one edge-sized exchange per round). The DuckDB oracle replays the
whole composition with a recursive CTE (__spark_entry__), so even this
multi-operator pipeline is cross-engine verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.functions.text import quality_score
from comm_detect_spark.operators.components import connected_components
from comm_detect_spark.operators.dedup import exact_duplicates, minhash_lsh_pairs


def dedup_clusters(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, cluster): cluster = min doc id reachable through the near-dup
    graph (exact content-hash groups ∪ LSH band collisions)."""
    ids = docs.select(F.col(id_col).alias("vid"))
    exact = (
        exact_duplicates(docs, id_col, text_col)
        .where(F.col("id") != F.col("keep_id"))
        .select(F.col("id").alias("src"), F.col("keep_id").alias("dst"))
    )
    lsh = minhash_lsh_pairs(docs, id_col, text_col, k, num_hashes, bands).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    und = exact.unionAll(lsh)
    edges = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    comp = connected_components(spark, edges, vertices=ids)
    return comp.select(F.col("vid").alias("id"), F.col("comp").alias("cluster"))


def corpus_keep_list(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    min_quality: float = 0.5,
) -> DataFrame:
    """(id, cluster, quality, keep): keep = the document is its cluster's
    representative (min id) AND passes the quality gate. Filtering the
    corpus to ``keep`` yields one best-effort copy of every near-dup
    class above the quality floor."""
    clusters = dedup_clusters(
        spark, docs, id_col, text_col, k, num_hashes, bands
    )
    quality = docs.select(
        F.col(id_col).alias("id"),
        quality_score(text_col).alias("quality"),  # rounds to 6 internally
    )
    return clusters.join(quality, "id").select(
        "id",
        "cluster",
        "quality",
        (
            (F.col("id") == F.col("cluster"))
            & (F.col("quality") >= F.lit(min_quality))
        ).alias("keep"),
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple = (("train", 0.9), ("val", 0.1)),
    seed: int = 42,
    denom: int = 1_000_000,
) -> DataFrame:
    """(id, split): deterministic train/val/test assignment by hashed id.

    The split of a document depends ONLY on (id, seed) — never on the rest
    of the corpus — so appending, filtering, or re-sharding the corpus
    keeps every existing assignment (the property random sampling lacks
    and training pipelines need for reproducible ablations). bucket =
    60-bit md5(id || '#' || seed) mod ``denom``; cumulative fraction
    thresholds over the bucket assign the named splits, remainders land in
    the last split. Pure column expression (JVM-side, one scan, no
    shuffle); the DuckDB oracle replays the identical md5 arithmetic.

    .. note:: CHANGED in round 5: the boundary moved from
       ``int(acc * denom)`` to ``round(acc * denom)`` (the truncation
       pushed float error one bucket below the documented fraction).
       Rows hashing exactly onto a boundary bucket are assigned
       differently than by builds before that change — re-materialize
       any persisted train/val splits from older runs rather than mixing
       old and new assignments."""
    from comm_detect_spark.operators.dedup import _h60

    bucket = F.pmod(
        _h60(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
        F.lit(denom),
    )
    expr = None
    acc = 0.0
    for name, frac in fractions[:-1]:
        acc += frac
        # round, not int-truncate: truncation pushes float error downward
        # (0.7 * 1e6 truncates to 699999), shifting the boundary one bucket
        # below the documented fraction and diverging from any replayer
        # that computes round(frac * denom)
        cond = bucket < round(acc * denom)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.select(F.col(id_col).alias("id"), split.alias("split"))


def pack_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    shard_tokens: int = 1_000_000,
    seed: int = 42,
) -> DataFrame:
    """(id, start_offset, shard_id): assign documents to fixed-budget
    training shards — the last step before a corpus becomes tokenizer
    input. Documents are laid out in the deterministic hash order
    (h60(md5(id#seed)), id) — the same shuffle a training run wants anyway
    — and a document's shard is its START offset's bucket:
    shard_id = floor(exclusive_prefix_sum(tokens) / shard_tokens).
    Append-stable it is NOT (packing is inherently order-global); it IS
    deterministic and exactly SQL-replayable (one window cumsum).

    100 TB shape: the naive formulation is SUM(tokens) OVER (ORDER BY ...)
    — a SinglePartition window, one reducer over the corpus. Here the
    prefix sum is two-phase, the dense_ids pattern (graph/core.py):
    range-partition by the order key (parallel sort), per-partition
    cumsum window, plus a broadcast exclusive prefix of the per-partition
    token totals (one row per partition). No single-reducer stage
    anywhere — plan-asserted in tests/test_plans.py."""
    from pyspark.sql import Window

    from comm_detect_spark.operators.dedup import _h60

    hk = _h60(F.concat(F.col("id").cast("string"), F.lit(f"#{seed}")))
    # freeze the ranged layout: range boundaries come from sampling and are
    # not reproducible across executions — the totals job and the window
    # job must see the SAME partition assignment (see dense_ids)
    # a NULL token count would flow silently into every downstream offset
    # (and a partition of all-NULLs would null its total and crash the
    # driver-side fold with a TypeError) — fail loudly at the scan instead
    tok_raw = F.col(tokens_col).cast("bigint")
    tok = F.when(tok_raw.isNotNull(), tok_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pack_shards: NULL/non-numeric {tokens_col} for id="),
                F.col(id_col).cast("string"),
                F.lit(" — fill or filter the tokens column before packing"),
            )
        )
    )
    ranged = (
        df.select(
            F.col(id_col).alias("id"),
            tok.alias("_tok"),
        )
        .withColumn("_hk", hk)
        .repartitionByRange(F.col("_hk"), F.col("id"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        ranged.groupBy("_pid").agg(F.sum("_tok").alias("t")).orderBy("_pid").collect()
    )  # one row per partition — driver-size safe
    acc = 0
    offsets = []
    for row in totals:
        offsets.append((row["_pid"], acc))
        acc += int(row["t"])
    offset_df = ranged.sparkSession.createDataFrame(
        offsets, "_pid INT, _off BIGINT"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_hk", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_cum", F.sum("_tok").over(w))
        .join(F.broadcast(offset_df), "_pid")
        .select(
            "id",
            (F.col("_off") + F.col("_cum") - F.col("_tok")).alias("start_offset"),
            F.floor(
                (F.col("_off") + F.col("_cum") - F.col("_tok"))
                / F.lit(shard_tokens)
            ).cast("bigint").alias("shard_id"),
        )
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 30,
    max_tokens: int = 10_000,
    min_quality: float = 0.8,
    allowed_langs: tuple[str, ...] = ("en",),
    max_dup_2gram: float = 0.05,
    max_top_token: float = 0.12,
) -> DataFrame:
    """C4/Gopher-style pre-training quality gate in ONE composed pass:
    per-document rule flags plus the final keep verdict (C4, Raffel et al.
    2020 §2.1; Gopher rules, Rae et al. 2021 §A1.1).

      pass_length      min_tokens <= n_tokens <= max_tokens
      pass_quality     quality_score(text) >= min_quality
      pass_lang        lang_id(text) in allowed_langs
      pass_repetition  dup_2gram_frac <= max_dup_2gram AND
                       top_token_frac <= max_top_token (NULL fractions —
                       too few tokens to form the statistic — pass the
                       repetition rule and are left to the length rule)
      keep             all four

    Emitting flags instead of filtering keeps the operator auditable: the
    per-rule rejection rates ARE the dataset card numbers, and the kept
    corpus is ``.where("keep")`` away.

    100 TB shape: quality/lang are pure codegen column exprs on the same
    scan; the repetition side is repetition_stats' two map-side-combined
    aggs; the only other exchange is the doc_id equi-join between the two
    sides — both already keyed by doc_id, so AQE plans it shuffle-light.
    No Python anywhere."""
    from comm_detect_spark.functions.text import lang_id
    from comm_detect_spark.operators.ranking import repetition_stats

    rep = repetition_stats(docs, id_col=id_col, text_col=text_col)
    expr_side = docs.select(
        F.col(id_col).alias("doc_id"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang"),
    )
    j = expr_side.join(rep, "doc_id")
    pass_length = (F.col("n_tokens") >= min_tokens) & (
        F.col("n_tokens") <= max_tokens
    )
    pass_quality = F.col("quality") >= min_quality
    pass_lang = F.col("lang").isin(*allowed_langs)
    pass_repetition = F.coalesce(
        F.col("dup_2gram_frac") <= max_dup_2gram, F.lit(True)
    ) & F.coalesce(F.col("top_token_frac") <= max_top_token, F.lit(True))
    return j.select(
        "doc_id",
        "n_tokens",
        "quality",
        "lang",
        "dup_2gram_frac",
        "top_token_frac",
        pass_length.alias("pass_length"),
        pass_quality.alias("pass_quality"),
        pass_lang.alias("pass_lang"),
        pass_repetition.alias("pass_repetition"),
        (pass_length & pass_quality & pass_lang & pass_repetition).alias(
            "keep"
        ),
    )

def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    denom: int = 1_000_000,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff
    ``bucket(id, seed) < round(frac(stratum) * denom)`` where bucket is
    the same 60-bit md5 arithmetic as hash_split. The training-mixture
    primitive (e.g. downsample low-quality languages, upweight code):
    membership depends ONLY on (id, seed, stratum fraction) — appending
    or re-sharding the corpus never flips an existing decision, and the
    same id keeps identical buckets across strata so samples at nested
    rates are nested subsets. Strata absent from ``fractions`` fall back
    to ``default_fraction``.

    100 TB shape: pure column expressions (one scan, zero shuffles, no
    Python); the fraction table enters as a literal CASE (pipeline
    configs are tiny), so Catalyst folds it into the scan filter and
    parquet row groups prune on the stratum column when it is a
    partition key. Sampling decisions round the SAME way as hash_split
    (round, not truncate — see the r5 boundary note there)."""
    from comm_detect_spark.operators.dedup import _h60

    bucket = F.pmod(
        _h60(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
        F.lit(denom),
    )
    thresh = None
    for name, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == name
        lit = F.lit(round(frac * denom))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    thresh = (
        F.lit(round(default_fraction * denom))
        if thresh is None
        else thresh.otherwise(round(default_fraction * denom))
    )
    return df.where(bucket < thresh)
