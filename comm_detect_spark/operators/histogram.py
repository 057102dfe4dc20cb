"""Fixed-bin histograms — deterministic distribution summaries.

No reference twin (SURVEY §2); the fixed-bin histogram completes the
repo's sketch quartet — FM (distinct counts, anf.py), CMS (frequencies,
cms.py), Bloom (membership, bloom.py), histogram (value DISTRIBUTION):
latency percentiles, document-length profiles, score calibration curves.

Unlike rank-based sketches (t-digest, GK) whose state depends on arrival
ORDER, a fixed-bin histogram is a pure function of the multiset:
bin = floor(value / bin_width) — so it is deterministic, mergeable by
cell addition, engine-replayable (the DuckDB oracle checks the counts
integer-exactly), and its streaming twin would be exact under the same
exactly-once argument as the CMS twin. The price is a fixed resolution
chosen up front instead of adaptive rank error — the right trade
everywhere this repo's determinism contract matters.

Plan shape: ONE map-side-combined groupBy(bin) count — the shuffled
table is range/bin_width rows regardless of input size. Quantile
estimation is a driver-side fold over the (tiny) sorted histogram:
the answer is the LOWER EDGE of the first bin whose cumulative count
reaches ceil(p * N) — a conservative, deterministic convention (error
bounded by bin_width, stated not interpolated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_histogram(
    df: DataFrame,
    value_col: str,
    bin_width: float = 1.0,
    group_col: str | None = None,
) -> DataFrame:
    """(bin BIGINT, cnt BIGINT) — or (group, bin, cnt) with ``group_col``:
    counts per floor(value / bin_width) bin. NULL values are dropped
    (stated). Negative values bin correctly (floor, not truncation)."""
    bin_ = F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint")
    keys = ([F.col(group_col).alias("grp")] if group_col else []) + [
        bin_.alias("bin")
    ]
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    probs: list[float],
    bin_width: float = 1.0,
) -> list[float]:
    """Driver-side quantile estimates from a binned_histogram() table:
    for each p, the lower edge (bin * bin_width) of the first bin (in bin
    order) whose cumulative count reaches ceil(p * N). The histogram is
    range/bin_width rows — a driver-safe collect by construction."""
    import math

    rows = sorted(
        (r["bin"], r["cnt"]) for r in hist.select("bin", "cnt").collect()
    )
    n = sum(c for _, c in rows)
    out = []
    for p in probs:
        if not 0 <= p <= 1:
            raise ValueError(f"prob {p} outside [0, 1]")
        target = max(1, math.ceil(p * n))
        acc = 0
        edge = float(rows[-1][0] * bin_width) if rows else float("nan")
        for b, c in rows:
            acc += c
            if acc >= target:
                edge = float(b * bin_width)
                break
        out.append(edge)
    return out
