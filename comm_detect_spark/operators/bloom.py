"""Bloom filter — mergeable set-membership summaries.

No reference twin (SURVEY §2); the Bloom filter is the membership sibling
of the CMS frequency sketch (cms.py) and the FM distinct sketch (anf.py):
"have we seen this URL / doc digest / benchmark shingle before?" in a
fixed bit budget, with one-sided error (NO false negatives — a present
key always probes true; absent keys false-positive with rate ~(1-e^(-kn/m))^k).
At 100 TB this is the broadcast-able form of a seen-set: decontaminate's
benchmark shingles, a crawl's visited-URL set, a dedup keep-list — all
fit in m/8 bytes instead of a per-key table.

Bit positions are the repo's deterministic 60-bit md5 prefix on
'{seed}:{i}:{key}' (i < num_hashes), so every engine rebuilds the
identical bit array and the DuckDB oracle checks the 64-bit WORDS
integer-exactly.

Plan shape: building is ONE explode(num_hashes) + hash + map-side-combined
bit_or over word index — partial filters merge before the exchange and the
shuffled table is at most m/64 rows regardless of input size. bit_or is
commutative AND idempotent, so the streaming twin is bit-identical to
batch under arbitrary replays (the FM argument, streaming/pipeline.py:347)
— stronger than the CMS twin's exactly-once requirement. Probing joins
num_hashes x |keys| probe rows against the word table and ANDs the bit
tests — watchlist-sized, never input-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bitpos(seed: int, num_bits: int):
    """bit position of hash i for the exploded (i, k) row."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col("i").cast("string"),
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
    return h % num_bits


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(word_idx, word): the nonzero 64-bit words of the Bloom bit array
    over the keys of ``df``. num_bits must be a multiple of 64."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    rows = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
    ).select(_bitpos(seed, num_bits).alias("pos"))
    return (
        rows.select(
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str = "k",
    num_bits: int = 4096,
    num_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(k, maybe_present): True iff ALL num_hashes bits of the key are set
    in the filter — never false for a key that was built in (no false
    negatives, pytest-pinned); True for an absent key with the standard
    false-positive rate. The probe side is num_hashes x |keys| rows
    joining the <= num_bits/64-row word table — broadcast-sized."""
    probes = keys.select(
        F.col(key_col).cast("string").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
    ).select("k", _bitpos(seed, num_bits).alias("pos"))
    checks = (
        probes.select(
            "k",
            (F.col("pos") / 64).cast("bigint").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "k",
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("bit")) != 0)
            ).alias("hit"),
        )
    )
    return checks.groupBy("k").agg(
        F.bool_and("hit").alias("maybe_present")
    )
