"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k against a query vector. The dot
  product runs JVM-side (zip_with + aggregate, whole-stage codegen); top-k
  is a single TakeOrderedAndProject — no global sort materialized.
* lsh_topk — random-hyperplane LSH bucketing: probe only the query's bucket
  (+ optional multi-probe neighbors). The scale path: bucket fan-out keeps
  the scan O(n / 2^bits) expected.
* ann_pairs — all near pairs by cosine >= threshold via bucket join
  (embedding near-dup dedup).

Hyperplanes are seeded deterministically (PCG64) and shipped as literal
arrays — no RNG at execution time, resumable plans stay identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_expr(vec_col, query: list[float]):
    """Cosine(vec, literal query) as a pure column expression (JVM-side)."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = _as_double(vec_col)
    dot = F.aggregate(
        F.zip_with(v, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm * F.lit(qn))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cosine) of the k nearest rows to ``query`` (exact)."""
    scored = df.select(
        F.col(id_col).alias("id"),
        F.round(cosine_expr(F.col(vec_col), query), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((bits, dim))


def bucket_expr(vec_col, planes: np.ndarray):
    """Sign-pattern bucket id of a vector under the hyperplanes (BIGINT)."""
    v = _as_double(vec_col)
    acc = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(v, plit, lambda a, b: a * b),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(dot > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(0)
    return acc


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket (plus
    ``multiprobe`` single-bit-flip neighbor buckets)."""
    q = np.asarray(query, dtype=np.float64)
    planes = _hyperplanes(len(q), bits, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(p @ q) > 0:
            qbucket |= 1 << i
    probe = [qbucket] + [qbucket ^ (1 << i) for i in range(min(multiprobe, bits))]
    bucketed = df.withColumn("_bucket", bucket_expr(F.col(vec_col), planes))
    cand = bucketed.where(F.col("_bucket").isin(probe))
    return brute_force_topk(cand, query, k, id_col, vec_col)


def ann_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """(id_a < id_b, cosine) for bucket-colliding pairs with cosine >=
    threshold — embedding near-dup dedup. Recall misses cross-bucket pairs
    (standard LSH trade: raise recall by lowering bits or unioning several
    seeds).

    ``dim``: embedding dimensionality; pass it when known to keep the plan
    fully lazy (when None, one row is sampled to learn it).
    ``max_bucket_size``: hub-bucket guard — a pathological bucket (e.g. many
    identical vectors) is otherwise a quadratic bomb at scale. Buckets are
    deterministically truncated to their ``max_bucket_size`` lowest ids
    before the pairwise stage (the per-bucket row_number is a sort, linear
    work — the O(S^2) join is what it prevents). Dropped rows lose their
    pairs; that is the documented recall trade, not silent corruption."""
    if dim is None:
        sample = df.select(vec_col).first()
        dim = len(sample[vec_col])
    planes = _hyperplanes(dim, bits, seed)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("bucket").orderBy("id")
        bucketed = (
            bucketed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    a = bucketed.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b = bucketed.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    va, vb = _as_double(F.col("va")), _as_double(F.col("vb"))
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x
    )
    na = F.sqrt(F.aggregate(va, F.lit(0.0), lambda a_, x: a_ + x * x))
    nb = F.sqrt(F.aggregate(vb, F.lit(0.0), lambda a_, x: a_ + x * x))
    return (
        pairs.select(
            "id_a", "id_b", F.round(dot / (na * nb), 6).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
