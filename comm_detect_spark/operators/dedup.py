"""Deduplication operators for training-data pipelines (round brief:
first-class components alongside SURVEY §2).

Five families, all shuffle-shaped for 100 TB:

* exact          — md5-of-normalized-text groupBy; one shuffle on a 64-bit
                   key, min-id representative (deterministic keep rule).
* minhash_lsh    — shingle -> k minhashes -> b bands -> band-bucket join;
                   only bucket collisions are pairwise-verified. The
                   candidate join is an equi-join on (band, signature-slice
                   hash): linear in collisions, never all-pairs.
* simhash        — 64-bit simhash from md5-hashed shingles; Hamming-ball
                   candidates via d+1 block keys (pigeonhole: any pair
                   within Hamming distance d shares one of d+1 blocks).
* ngram_jaccard  — exact Jaccard on shingle sets via shared-shingle
                   self-join + |A|,|B| counts (inverted-index shape: the
                   join is on shingle, so cost ~ sum of posting-list^2,
                   bounded by dropping ultra-common shingles).
* embedding near-dup — cosine >= threshold via the similarity module.

Everything is md5-based so the DuckDB oracle can reproduce signatures
bit-for-bit (Spark: conv(substring(md5(x),1,15),16,10); DuckDB:
CAST(CONCAT('0x', SUBSTRING(md5(x),1,15)) AS BIGINT)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(c):
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def _h60(c) -> F.Column:
    """60-bit deterministic hash of a string column (md5-prefix).

    ONLY for signature arithmetic the DuckDB oracle must replay as a BIGINT
    (minhash min(), simhash bit votes). NEVER the key of a keep/delete rule:
    at 10^12 documents the birthday bound on 60 bits gives ~4x10^5 expected
    collisions — silently deleting distinct documents. Keep-rules key on
    content_hash() (full 128-bit digest) instead."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def content_hash(c) -> F.Column:
    """Full 128-bit content digest (md5 hex string) of the normalized text —
    the production dedup key. Collision probability at 10^12 docs is
    ~2^-40 per the birthday bound: negligible, unlike the 60-bit prefix
    (see _h60). DuckDB's md5() emits the identical lowercase hex, so the
    cross-engine oracle still matches bit-for-bit."""
    return F.md5(_norm(c))


def shingle_array(col, k: int = 3) -> F.Column:
    """Array of k-word shingles of the normalized text — the per-row
    (stateless) building block shared by the exploded batch form and the
    streaming decontaminator."""
    toks = F.split(_norm(col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.filter(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
        lambda s: F.length(s) > 0,
    )


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle): distinct k-word shingles of the normalized text."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingle_array(F.col(text_col), k)).alias("shingle"),
        )
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, keep_id, content_hash): groups of byte-equal (after whitespace/
    case normalization) docs; keep_id = min id of the group. Keyed on the
    FULL 128-bit md5 (see content_hash) — a keep-one-per-group rule must not
    false-merge distinct documents at corpus scale."""
    hashed = df.select(
        F.col(id_col).alias("id"), content_hash(F.col(text_col)).alias("content_hash")
    )
    keep = hashed.groupBy("content_hash").agg(F.min("id").alias("keep_id"))
    return hashed.join(keep, "content_hash").select("id", "keep_id", "content_hash")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """(id, h: 0..num_hashes-1, minhash). Hash family i is
    md5(shingle || '#' || i) — deterministic, oracle-reproducible."""
    sh = shingles(df, id_col, text_col, k)
    hashes = sh.select(
        "id",
        F.explode(
            F.array(*[F.lit(i) for i in range(num_hashes)])
        ).alias("h"),
        F.col("shingle"),
    ).select(
        "id",
        "h",
        _h60(
            F.concat(F.col("shingle"), F.lit("#"), F.col("h").cast("string"))
        ).alias("hv"),
    )
    return hashes.groupBy("id", "h").agg(F.min("hv").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) that collide in >=1 LSH band.
    rows_per_band = num_hashes // bands."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    # bucket key: minhashes of the band concatenated in h order — built so
    # the DuckDB oracle can produce the identical string
    # (string_agg(minhash, ',' ORDER BY h))
    banded = (
        sig.withColumn("band", (F.col("h") / rows).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                        lambda x: x["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("bucket")
        )
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, simhash BIGINT): 60-bit simhash — per bit, sign of the sum of
    (+1/-1) votes from each shingle's md5-prefix hash.

    Plan shape: ONE hash aggregation on id with 60 sum buffers (one per
    bit) — no row explosion. The earlier formulation exploded every shingle
    into 60 (id, bit, vote) rows before aggregating, multiplying shuffle
    volume 60x; here the shuffle carries one 60-wide partial-agg row per
    (map partition, id)."""
    sh = shingles(df, id_col, text_col, k).select(
        "id", _h60(F.col("shingle")).alias("hv")
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(hv >> {b}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(60)
    ]
    agg = sh.groupBy("id").agg(*votes)
    sim = None
    for b in range(60):
        term = F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    max_hamming: int = 3,
    num_bits: int = 60,
) -> DataFrame:
    """(id_a < id_b, hamming): near-dup pairs with simhash Hamming distance
    <= max_hamming. Candidates via the pigeonhole block trick: split the
    signature into max_hamming+1 blocks — any pair within distance d agrees
    on at least one block — and equi-join on (block, block_bits); only
    collisions get the exact bit_count(xor) verification. Never all-pairs;
    the join is bucketed exactly like minhash_lsh_pairs."""
    nblocks = max_hamming + 1
    if num_bits % nblocks:
        raise ValueError(f"num_bits={num_bits} not divisible by {nblocks} blocks")
    width = num_bits // nblocks
    mask = (1 << width) - 1
    sig = simhash(df, id_col, text_col, k)
    blocks = sig.select(
        "id",
        "simhash",
        F.explode(F.array(*[F.lit(i) for i in range(nblocks)])).alias("blk"),
    ).withColumn("key", F.expr(f"(simhash >> (blk * {width})) & {mask}"))
    a = blocks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sim_a"), "blk", "key"
    )
    b = blocks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sim_b"), "blk", "key"
    )
    cand = (
        a.join(b, ["blk", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.expr("bit_count(sim_a ^ sim_b)").cast("int").alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact shingle-Jaccard pairs (id_a < id_b, jaccard >= threshold).
    Inverted-index join on shingle; ``max_doc_freq`` drops shingles shared
    by too many docs (the hub-key guard — at web scale a boilerplate shingle
    would otherwise produce a quadratic bucket)."""
    sh = shingles(df, id_col, text_col, k)
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, hits, contaminated): flag training documents that share any
    n-word shingle with a held-out benchmark/eval set — the
    decontamination pass every training-data pipeline runs before a model
    sees the corpus. ``hits`` = number of distinct leaked shingles (the
    audit evidence, not just a boolean).

    100 TB shape: eval sets are MBs against a corpus of TBs, so the
    benchmark shingle table is BROADCAST and the corpus side is a
    map-side semi-join over its exploded shingles — the only shuffle is
    the per-id count of HIT rows (tiny). The corpus is scanned twice
    (shingles + the id spine) but both scans column-prune to (id, text)
    and (id,). Set ``broadcast_benchmark=False`` if the reference set is
    itself huge (then it is a plain shuffle equi-join on shingle)."""
    doc_sh = shingles(docs, id_col, text_col, n)
    bench_sh = (
        shingles(
            benchmark.select(
                F.lit(0).alias("_bid"), F.col(bench_text_col).alias("text")
            ),
            "_bid",
            "text",
            n,
        )
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        doc_sh.join(bench_sh, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def doc_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_segment: int = 8,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(doc_id, seg_idx, segment [, passthrough...]): fixed-token
    segmentation as STATELESS
    array expressions — tokenize, slice the token array per segment index,
    posexplode. No aggregation, no shuffle, codegen-resident; this is what
    lets the streaming twin chain a single stateful dedup operator instead
    of an agg + dedup pair (and saves the batch path one exchange).
    Documents with zero tokens produce no segments."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    extra = list(passthrough or [])
    base = docs.select(
        F.col(id_col).alias("doc_id"), *extra, toks.alias("toks")
    ).where(F.size("toks") > 0)
    nseg = F.ceil(
        F.size("toks") / F.lit(float(tokens_per_segment))
    ).cast("int")
    segarr = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(
            F.slice(
                "toks", i * tokens_per_segment + 1, tokens_per_segment
            ),
            " ",
        ),
    )
    return base.select(
        "doc_id", *extra, F.posexplode(segarr).alias("seg_idx", "segment")
    ).select(
        "doc_id",
        F.col("seg_idx").cast("bigint").alias("seg_idx"),
        "segment",
        *extra,
    )


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_segment: int = 8,
) -> DataFrame:
    """Segment-level exact dedup (the C4 / RefinedWeb "remove duplicated
    lines across the corpus" step): split every document into fixed
    ``tokens_per_segment``-token segments, keep each distinct segment's
    GLOBAL first occurrence (lowest (doc_id, seg_idx)), drop every later
    copy, and reassemble the survivors in document order.

    Returns (doc_id, text_clean, n_kept) — documents whose every segment
    was seen earlier elsewhere vanish entirely (inner-aggregation
    semantics, the C4 behaviour).

    Real pipelines segment on newlines/sentences; the tokenizer here is
    the repo-standard whitespace split and the segment boundary a fixed
    token count so the synthetic corpus (no newlines) still exercises the
    identical plumbing — the segmenter is the only swappable part.

    100 TB shape: the dedup shuffle keys on md5(segment) (full 128-bit
    digest, exact_duplicates' argument: 2^64 segments before birthday
    trouble), not the segment string — the wide text rides once as the
    min-struct payload; winner pick is one hash agg (map-side combined), the
    reassembly one more agg on doc_id. Nothing is quadratic; boilerplate
    mega-duplicates (the same cookie banner in 10^9 docs) are exactly the
    hot keys the map-side combine collapses BEFORE the exchange."""
    segs = doc_segments(docs, id_col, text_col, tokens_per_segment)
    winners = (
        segs.groupBy(F.md5(F.col("segment")).alias("h"))
        .agg(F.min(F.struct("doc_id", "seg_idx", "segment")).alias("w"))
        .select("w.doc_id", "w.seg_idx", "w.segment")
    )
    return (
        winners.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seg_idx", "segment"))
                    ),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )

def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, containment): ASYMMETRIC shingle containment
    |S_a ∩ S_b| / |S_a| for every ordered pair with containment >=
    threshold (id_a != id_b, both directions emitted independently).

    Jaccard misses subset duplicates — a paragraph quoted whole inside a
    10x longer page scores J ≈ 0.1 but containment(quote, page) = 1.0;
    containment is the near-dup signal for excerpt/boilerplate-wrapper
    detection (Broder's "containment" companion to resemblance,
    SEQUENCES'97). Same inverted-index join + hub-shingle guard as
    ngram_jaccard_pairs — never all-pairs; candidate volume is bounded
    by shared-shingle co-occurrence with df <= max_doc_freq."""
    sh = shingles(df, id_col, text_col, k)
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("sz", "sz_a"), "id_a")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") / F.col("sz_a"), 6).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, n_shingles, n_hit, contamination): graded decontamination —
    for each training document, the FRACTION of its distinct n-word
    shingles that appear anywhere in the benchmark set (contamination =
    n_hit / n_shingles, round 6). Where decontaminate() answers "did any
    n-gram leak?", this scores partial overlap (the GPT-3 appendix-C
    style n-gram-overlap audit): a 0.9 doc is a near-copy of an eval
    item, a 0.02 doc shares a stock phrase — different removal policies.

    100 TB shape: same join geometry as decontaminate (benchmark shingles
    BROADCAST, corpus side a map-side hit-flag over exploded distinct
    shingles); the per-id agg counts total and hit shingles in ONE pass
    (conditional sum, no second join). Output is one row per corpus doc.
    Docs whose normalized text is empty have n_shingles=0 and NULL
    contamination (try_divide)."""
    doc_sh = shingles(docs, id_col, text_col, n)
    bench_sh = (
        shingles(
            benchmark.select(
                F.lit(0).alias("_bid"), F.col(bench_text_col).alias("text")
            ),
            "_bid",
            "text",
            n,
        )
        .select("shingle", F.lit(1).alias("_hit"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    scored = (
        doc_sh.join(bench_sh, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(
                F.try_divide(
                    F.coalesce("n_hit", F.lit(0)),
                    F.coalesce("n_shingles", F.lit(0)),
                ),
                6,
            ).alias("contamination"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """(id, fp): winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every positional k-word
    shingle, slide a w-shingle window, keep the MINIMUM hash of each
    window, emit the distinct selected hashes per document. Guarantees
    any shared run of >= w+k-1 words between two documents yields at
    least one shared fingerprint, while storing ~2/(w+1) of the shingle
    hashes — the sub-document copy-detection index (plagiarism / quote /
    mirror detection) that complements whole-doc minhash.

    The 60-bit hash is signature arithmetic (see _h60) — downstream
    keep/delete decisions must re-verify on content, same contract as
    minhash bands.

    100 TB shape: positional shingling is a per-row array transform
    (no explode-then-window repartition: the window partitions by id,
    which the explode already co-locates — ONE shuffle on id); the
    sliding MIN is a bounded-frame window aggregate inside each
    document, then a distinct on (id, fp) whose output is the ~2/(w+1)
    sample. Nothing crosses document boundaries."""
    from pyspark.sql import Window

    pos_sh = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(shingle_array(F.col(text_col), k)).alias("pos", "shingle"),
    ).select("id", "pos", _h60(F.col("shingle")).alias("h"))
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        pos_sh.select("id", F.min("h").over(win).alias("fp"))
        .distinct()
    )
