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
    shuffle); the DuckDB oracle replays the identical md5 arithmetic."""
    from comm_detect_spark.operators.dedup import _h60

    bucket = F.pmod(
        _h60(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
        F.lit(denom),
    )
    expr = None
    acc = 0.0
    for name, frac in fractions[:-1]:
        acc += frac
        cond = bucket < int(acc * denom)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.select(F.col(id_col).alias("id"), split.alias("split"))
