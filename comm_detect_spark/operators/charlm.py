"""Character-trigram corpus-typicality scoring — corpus-fit text quality.

The heuristic quality gates (functions/text.py) judge a document by its
OWN statistics; this operator judges it against the CORPUS: count every
character trigram over the whole corpus (one pass), then score each
document by the average log-probability of its trigrams under the
corpus trigram distribution. Gibberish, encoding mojibake, and
wrong-language text are built from trigrams the corpus rarely produces,
so they sit far below the corpus-typical band even when their
length/punctuation stats look fine — the CCNet-style perplexity filter
(Wenzek et al., LREC 2020) with the external KenLM model replaced by an
in-engine trigram fit, so the whole filter is one self-contained Spark
job with no model artifact.

Score(d) = (1/|T_d|) * sum over trigram positions t of
           log2( count_corpus(tri_t) / total_corpus_trigrams )
— the mean surprisal (negated) of the document under the corpus
trigram unigram-distribution MLE. Deliberately NOT the conditional
P(c_i | c_{i-2} c_{i-1}): the unsmoothed conditional rewards documents
whose contexts are globally UNIQUE (a context seen only inside one
gibberish doc has a deterministic continuation, P = 1), inverting the
signal; the joint distribution has no such failure and needs no
smoothing constant to replicate cross-engine. Every trigram of every
document appears in the corpus counts by construction (the corpus
includes the document), so no zero-probability terms arise.

Plan shape (all built-in JVM expressions, no Python): normalize text ->
per-document trigram multiset via one transform over the index range ->
explode -> ONE map-side-combined corpus count keyed by trigram (domain
is bounded: |charset|^3, not corpus-sized) -> join document trigrams to
the broadcast-sized model (+ the one-row total cross-joined, the
repo-standard scalar broadcast) -> one per-document avg. At 100 TB the
(doc, trigram) explode is the big table — linear in corpus characters,
the same cost class as tokenization — and the model join's build side
(distinct trigrams) broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NORM = r"\s+"


def _char_ngrams(col, n: int):
    """array of n-grams of the normalized text column (empty when the
    text is shorter than n)."""
    t = F.regexp_replace(F.lower(F.trim(col)), _NORM, " ")
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def charlm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_trigrams, lm_score): average log2 P(trigram) of the
    document under the corpus trigram distribution; lm_score NULL when
    the document has no trigram (len < 3). Rounded to 6 (cross-engine
    convention). Higher = more corpus-typical."""
    txt = F.col(text_col)
    tris = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_char_ngrams(txt, 3)).alias("tri"),
    )
    doc_tri = tris.groupBy("doc_id", "tri").agg(
        F.count(F.lit(1)).alias("tf")
    )
    corpus_tri = doc_tri.groupBy("tri").agg(F.sum("tf").alias("c3"))
    total = corpus_tri.agg(F.sum("c3").cast("double").alias("ct"))
    scored = (
        doc_tri.join(corpus_tri, "tri")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.round(
                F.sum(F.col("tf") * F.log2(F.col("c3") / F.col("ct")))
                / F.sum("tf"),
                6,
            ).alias("lm_score"),
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
        "lm_score",
    )
