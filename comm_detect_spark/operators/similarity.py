"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k against a query vector. The dot
  product runs JVM-side (zip_with + aggregate, whole-stage codegen); top-k
  is a single TakeOrderedAndProject — no global sort materialized.
* lsh_topk — random-hyperplane LSH bucketing: probe only the query's bucket
  (+ optional multi-probe neighbors). The scale path: bucket fan-out keeps
  the scan O(n / 2^bits) expected.
* ivf_topk — IVF coarse quantizer: deterministic k-means centroids shipped
  as literals, JVM-side nearest-list assignment, exact search over the
  nprobe closest inverted lists (expected scan n * nprobe / n_centroids;
  store the list id as a partition column to get partition pruning).
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


def kmeans_centroids(
    x: np.ndarray, n_centroids: int, seed: int = 42, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd k-means (PCG64 init, lowest-index argmin ties).
    Shared by the Spark fit and the DuckDB-oracle generator so centroid
    literals are identical in both engines."""
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = x[
        rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]), replace=False)
    ].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties -> lowest index (numpy argmin)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if members.size:
                cent[c] = members.mean(axis=0)
    return cent


def ivf_fit_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample: int = 2048,
    iters: int = 10,
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means on the ``sample``
    lowest-id rows. The sample is driver-side (a few thousand vectors even
    at 100 TB); assignment/search stay distributed. The id-ordered sample +
    pinned k-means make the centroids reproducible LITERALS — the same
    shipped-constant scheme as the LSH hyperplanes, and replayable by the
    DuckDB oracle."""
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    x = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    return kmeans_centroids(x, n_centroids, seed, iters)


def ivf_list_expr(vec_col, centroids: np.ndarray):
    """Nearest-centroid id (euclidean, ties -> lowest id) as a pure column
    expression — ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2, with ||v||^2
    constant across candidates, so argmin reduces to the JVM-side
    argmax of (v.c - ||c||^2 / 2)."""
    v = _as_double(vec_col)
    best_score, best_id = None, None
    for i, c in enumerate(centroids):
        clit = F.array(*[F.lit(float(x)) for x in c])
        score = F.aggregate(
            F.zip_with(v, clit, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
        ) - F.lit(float(c @ c) / 2.0)
        if best_score is None:
            best_score, best_id = score, F.lit(i)
        else:
            better = score > best_score  # strict: ties keep the lower id
            best_score = F.when(better, score).otherwise(best_score)
            best_id = F.when(better, F.lit(i)).otherwise(best_id)
    return best_id


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine over only the ``nprobe`` inverted
    lists nearest to the query — the expected scan is n * nprobe /
    n_centroids. Partition-prunable when the table is written partitioned
    by the list id (ivf_list_expr is deterministic, so list assignment can
    be a stored column)."""
    q = np.asarray(query, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]
    listed = df.withColumn("_ivf", ivf_list_expr(F.col(vec_col), centroids))
    cand = listed.where(F.col("_ivf").isin(probe))
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
