"""Link prediction scores: common neighbors, Jaccard, Adamic-Adar.

No reference twin (SURVEY §2 is community detection); this is the standard
web-graph link-analysis block next to triangles/clustering — scoring vertex
pairs by shared neighborhoods (Liben-Nowell & Kleinberg, CIKM'03).

Shape: wedge enumeration. For every center w, each unordered pair of its
neighbors (u, v) is one wedge; scores aggregate wedges per (u, v):

    common(u,v)      = #wedges
    adamic_adar(u,v) = sum over centers w of 1 / ln(deg(w))
    jaccard(u,v)     = common / (deg(u) + deg(v) - common)

A wedge center has degree >= 2 by construction, so ln(deg(w)) > 0 — no
division guard needed.

100 TB shape: wedge count is sum_w deg(w)^2 — a hub with 10^7 neighbors
alone yields 10^14 wedges, so unguarded enumeration is a scale-killer. Two
controls, same policy as the dedup family's hub guards (dedup.py
max_doc_freq): (1) `max_center_degree` drops hyper-hub CENTERS
deterministically (a celebrity page connecting everyone is noise for
neighborhood similarity, exactly like a boilerplate shingle — the dropped
mass is quantified, not silent: count the dropped centers via the returned
plan's degree table if needed); (2) the per-center pair generation is an
equi-self-join on the center key, so AQE skew-join splits what remains.
Degrees are a vertex-sized table joined twice — broadcast when small,
shuffle otherwise; Catalyst picks via AQE."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction_scores(
    edges: DataFrame,
    max_center_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """(u, v, common, jaccard, adamic_adar) for unordered pairs u < v with
    at least `min_common` shared neighbors, over the undirected SIMPLE
    graph derived from `edges` (self-loops dropped, directions folded).

    Scores use FULL degrees (deg counts every neighbor) even when
    `max_center_degree` prunes hyper-hub centers from wedge enumeration —
    the cap changes which wedges are counted, never the degree
    normalization."""
    simple = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    adj = simple.select(
        F.col("a").alias("vid"), F.col("b").alias("nbr")
    ).unionAll(
        simple.select(F.col("b").alias("vid"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("vid").agg(F.count(F.lit(1)).alias("deg"))

    centers = adj.select(
        F.col("nbr").alias("w"), F.col("vid").alias("leaf")
    ).join(deg.withColumnRenamed("vid", "w"), "w")
    if max_center_degree is not None:
        centers = centers.where(F.col("deg") <= max_center_degree)

    wedges = (
        centers.alias("x")
        .join(centers.alias("y"), "w")
        .where(F.col("x.leaf") < F.col("y.leaf"))
        .select(
            F.col("x.leaf").alias("u"),
            F.col("y.leaf").alias("v"),
            # the center's FULL degree rides along on the wedge row, so
            # adamic-adar needs no extra join
            (F.lit(1.0) / F.log(F.col("x.deg"))).alias("aa_term"),
        )
    )
    scores = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common"),
        F.sum("aa_term").alias("aa"),
    )
    if min_common > 1:
        scores = scores.where(F.col("common") >= min_common)
    return (
        scores.join(deg.withColumnRenamed("vid", "u"), "u")
        .withColumnRenamed("deg", "deg_u")
        .join(deg.withColumnRenamed("vid", "v"), "v")
        .withColumnRenamed("deg", "deg_v")
        .select(
            "u",
            "v",
            "common",
            F.round(
                F.col("common")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common")),
                6,
            ).alias("jaccard"),
            F.round(F.col("aa"), 6).alias("adamic_adar"),
        )
    )
