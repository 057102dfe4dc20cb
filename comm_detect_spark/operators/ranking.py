"""Corpus term weighting: TF-IDF and Okapi BM25.

The reference engine has no text-ranking surface (SURVEY §2); these are the
standard scoring blocks of a training-data pipeline — quality-weighting
terms, retrieval-style filtering, decontamination triage — over the same
whitespace tokenization as the wordcount profile (functions/text.py).

Everything is built-in JVM expressions: explode -> two hash aggregations
(per-(doc, token) tf; per-token document frequency) -> one token-keyed join
-> arithmetic. The corpus-wide scalars (N docs, avg doc length) are one-row
aggregates cross-joined back (broadcast of a single row — no driver-side
collect in the plan).

100 TB shape: tf and df are map-side-combined aggs; the tf<-df join
shuffles on token — stopword keys are hot but BOUNDED (each token's df row
is 1 row; the fat side is the (doc, token) table, which AQE skew-join
splits, pagerank-hub story). No per-row Python; floats enter only in the
final ln()/divide, and driver-checked outputs round to 6 decimals
(cross-engine libm last-ulp convention, same as hits/clustering)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, token, tf): whitespace-lower tokenization, term counts per
    document. One explode + one hash agg."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).where(F.col("token") != "")
    return toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )


def _with_corpus_scalars(terms: DataFrame) -> DataFrame:
    """Attach n_docs (corpus size) and df (document frequency) columns."""
    ndocs = terms.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    dfreq = terms.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_docs")
    )
    return terms.join(dfreq, "token").crossJoin(F.broadcast(ndocs))


def tfidf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, token, tf, df_docs, score): score = tf * ln(N / df).

    Classic raw-count TF-IDF; a token present in every document scores
    exactly 0."""
    t = _with_corpus_scalars(doc_terms(docs, id_col, text_col))
    return t.select(
        "doc_id",
        "token",
        "tf",
        "df_docs",
        F.round(
            F.col("tf") * F.log(F.col("n_docs") / F.col("df_docs")), 6
        ).alias("score"),
    )


def top_terms_per_doc(scored: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, token, score, rnk): the k highest-scored terms of every
    document from a (doc_id, token, ..., score) table — the keyword-
    extraction step downstream of tfidf/bm25.

    Deterministic rank: (score DESC, token ASC) — scores are already
    rounded to 6 by the producers, so ties (and the whole ordering) are
    engine-independent. One window over doc_id: Spark's WindowExec runs
    per-partition after a hash exchange on the partition key — top-k per
    group at 100 TB is exactly this plan (rank + filter pushes the heap
    into the sort), no driver involvement."""
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.select(
            "doc_id", "token", "score", F.row_number().over(w).alias("rnk")
        )
        .where(F.col("rnk") <= k)
    )


def bm25(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, token, tf, df_docs, score): Okapi BM25 per (doc, term).

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))   -- always positive
    score = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    dl is the document's token count (with multiplicity), avgdl the corpus
    mean — a one-row broadcast, not a collect."""
    terms = doc_terms(docs, id_col, text_col)
    dl = terms.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    t = (
        _with_corpus_scalars(terms)
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
        / (F.col("df_docs") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    return t.select(
        "doc_id",
        "token",
        "tf",
        "df_docs",
        F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 6).alias(
            "score"
        ),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, dup_2gram_frac, top_token_frac): the Gopher-rule
    repetition signals (Rae et al. 2021 §A1.1) used to drop boilerplate
    and keyword-stuffed pages before training:

      dup_2gram_frac  = 1 - distinct_2grams / total_2grams   (NULL if < 2
                        tokens — no 2-grams exist, stated not hidden)
      top_token_frac  = occurrences of the most frequent token / n_tokens

    The 2-gram side is PURE array expressions on the tokenized column (no
    shuffle at all — the per-row sequence/transform/array_distinct chain
    stays in codegen); the top-token side is one explode + (doc, token)
    hash agg + (doc) max-agg — two map-side-combined exchanges. Floats
    round to 6 (cross-engine convention)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_tokens"),
    )
    # sequence end clamped at 0 so the n_tokens<2 rows (whose result is
    # NULLed by the when() below) never build sequence(0, -1); F.get is
    # 0-based and NULL-on-out-of-bounds (ANSI-safe, unlike element_at)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.col("n_tokens") - 2, F.lit(0))),
        lambda i: F.concat(
            F.get("toks", i), F.lit(" "), F.get("toks", i + 1)
        ),
    )
    gram_side = base.select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") >= 2,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(grams))
                / (F.col("n_tokens") - 1).cast("double"),
                6,
            ),
        ).alias("dup_2gram_frac"),
    )
    tok_counts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(toks).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    return gram_side.join(tok_counts, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_2gram_frac",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("top_c") / F.col("n_tokens"), 6),
        ).alias("top_token_frac"),
    )

def bigram_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(bigram, n): corpus-wide adjacent-word-pair counts over the same
    whitespace-lower tokenization as doc_terms — the collocation /
    phrase-mining profile (and the n=2 building block of an n-gram LM).

    Plan: per-document word array, then ONE transform over index range
    [1, len) pairs w[i-1] with w[i] (0-indexed Spark subscripts), explode,
    one map-side-combined count — no self-join, no window, no Python.
    Cost is linear in corpus tokens; the count agg's keys are the hot
    stopword-pair heads, bounded the same way as wordcount (each key
    reduces to one row, AQE splits skewed reducers)."""
    words = docs.select(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("ws")
    ).select(F.filter("ws", lambda w: w != "").alias("ws"))
    bigrams = words.select(
        F.explode(
            F.transform(
                # sequence over positions 1..len-1 (empty when len < 2)
                F.when(
                    F.size("ws") >= 2,
                    F.sequence(F.lit(1), F.size("ws") - 1),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat(
                    F.element_at(F.col("ws"), i),
                    F.lit(" "),
                    F.element_at(F.col("ws"), i + 1),
                ),
            )
        ).alias("bigram")
    )
    return bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))


def bigram_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(bigram, n, pmi): pointwise mutual information of adjacent word
    pairs — the collocation extractor (Church & Hanks '90) layered on
    bigram_counts: pmi = ln(P(a,b) / (P_left(a) * P_right(b))) with the
    margins taken from the bigram table itself (left margin = count of a
    as first word, right margin = count of b as second word, N = total
    bigrams), so the three estimates share one sample space. min_count
    floors the classic low-frequency PMI blowup (a pair seen once gets a
    huge score by chance).

    100 TB shape: one bigram count (linear in corpus tokens, map-side
    combined), two margin re-aggregations of the COUNTED table (key
    cardinality = vocabulary, not corpus), one broadcast scalar for N,
    two vocabulary-keyed joins back. Nothing rescans the corpus; output
    is the >= min_count vocabulary-pair table."""
    # no persist: the module's convention is stateless operators with no
    # cache-release obligation on the caller (ADVICE r5 discipline); the
    # margin branches re-derive the counted table, whose shuffle Spark's
    # ReusedExchange dedups within the one output plan
    bc = bigram_counts(docs, id_col, text_col)
    left = bc.groupBy(
        F.split("bigram", " ")[0].alias("wa")
    ).agg(F.sum("n").alias("n_a"))
    right = bc.groupBy(
        F.split("bigram", " ")[1].alias("wb")
    ).agg(F.sum("n").alias("n_b"))
    total = bc.agg(F.sum("n").alias("n_total"))
    out = (
        bc.where(F.col("n") >= min_count)
        .withColumn("wa", F.split("bigram", " ")[0])
        .withColumn("wb", F.split("bigram", " ")[1])
        .join(left, "wa")
        .join(right, "wb")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.log(
                    (F.col("n").cast("double") * F.col("n_total"))
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return out
