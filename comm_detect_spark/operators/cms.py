"""Count-min sketch — mergeable frequency summaries (Cormode-Muthukrishnan).

No reference twin (SURVEY §2); CMS is the frequency-sketch sibling of the
FM distinct sketch (anf.py) in a training-data pipeline: approximate
per-key counts (URL hits, token frequencies, per-host page counts) in
depth x width integers instead of a full per-key shuffle, with the
one-sided guarantee est >= true (overestimate only, by at most eps*N with
prob 1-delta for width=e/eps, depth=ln(1/delta)).

Hashing is the repo's deterministic 60-bit md5 prefix on '{seed}:{d}:{key}'
— every engine with md5 rebuilds the identical sketch, so the DuckDB
oracle checks the SKETCH CELLS exactly, not just the estimates.

Plan shape: building the sketch is ONE explode(depth) + hash + a
map-side-combined groupBy(d, bucket) SUM — counters merge associatively,
so partial sketches combine before the exchange and the shuffled table is
depth x width rows, independent of input size. That is the whole point at
100 TB: the exact alternative shuffles every key. The streaming twin runs
the identical aggregation under a watermark; SUM is commutative (order-
independent) but NOT idempotent, so the stream equals batch under
Structured Streaming's exactly-once state guarantee — one honesty notch
below the FM twin's replay-proof bit_or (streaming/pipeline.py:347).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(seed: int, width: int):
    """bucket_d(k) for the exploded (d, k) row — h60('{seed}:{d}:{k}') %
    width."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col("d").cast("string"),
                    F.lit(":"),
                    F.col("k"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return h % width


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
    weight_col: str | None = None,
) -> DataFrame:
    """(d, bucket, cnt): the depth x width counter matrix over the keys of
    ``df`` (each occurrence counts 1, or its ``weight_col``). Only nonzero
    cells are emitted (sparse sketch; missing cell = 0)."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.select(
        F.col(key_col).cast("string").alias("k"),
        w.alias("w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        rows.select("d", _bucket(seed, width).alias("bucket"), "w")
        .groupBy("d", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "k",
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """(k, est): count-min estimate for each key in ``keys`` — min over
    the depth rows of the key's bucket counters (absent cell = 0). The
    query-key set is the SMALL side (a watchlist, candidate heavy
    hitters): depth x |keys| probe rows join the depth x width sketch —
    broadcast-sized both sides, never input-sized."""
    probes = keys.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select("k", "d", _bucket(seed, width).alias("bucket"))
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
