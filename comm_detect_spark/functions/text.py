"""Text-analysis column functions for training-data pipelines.

All JVM-side built-ins (whole-stage codegen) — no Python in the hot path.
Each returns a Column; the matching ANSI-SQL oracle lives in
__spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram language heuristic.
# Deliberately small + deterministic: the point is the Spark plumbing, not
# linguistic accuracy (real deployments swap in fastText via pandas UDF).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "el": ["και", "του", "της", "το", "των"],
}


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish subword proxy: alpha runs, digit runs, and single punctuation
    marks each count as one token. RE2-compatible pattern (same expression
    works in the DuckDB oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def quality_score(col: str | Column) -> Column:
    """Heuristic document quality in [0,1]: blend of length saturation,
    alpha ratio, and mean-word-length plausibility. Deterministic, pure
    column arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z ]", ""))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    toks = token_count(c)
    mean_word = n_chars / F.greatest(toks, F.lit(1))
    len_sat = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_ok = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.3)
    return F.round(
        (len_sat * 0.4 + alpha_ratio * 0.4 + word_ok * 0.2), 6
    )


def lang_id(col: str | Column) -> Column:
    """Stopword-marker language heuristic: score each language by marker
    hits in the lowercased text; highest count wins, ties -> lexicographic
    language code; no hits -> 'und'."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        s = None
        for m in markers:
            # non-regex occurrence count of " marker " — identical replace()
            # semantics in Spark and DuckDB (oracle-friendly)
            needle = f" {m} "
            hits = (
                F.length(padded)
                - F.length(F.replace(padded, F.lit(needle), F.lit("")))
            ) / F.lit(len(needle))
            s = hits if s is None else s + hits
        scores.append(F.struct(s.alias("score"), F.lit(lang).alias("lang")))
    best = F.greatest(*scores)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: str | Column) -> Column:
    """64-bit-ish document fingerprint: first 15 hex chars of md5 of the
    whitespace-normalized lowercased text, as BIGINT. Matches the DuckDB
    oracle expression CAST(CONCAT('0x', SUBSTRING(md5(norm),1,15)) AS
    BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint")
