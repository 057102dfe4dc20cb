"""Modularity scoring — the reference's exact formula (modularity.h:175-191):

    Q = sum_C [ w_in(C)/W  -  vol(C)^2 / (4 W^2) ]

W = sum of all adjacency entries (M4); w_in(C) = sum of entries with both
endpoints in C (intra edges twice, self-loops once — M2/M3); vol from
volumes_df (self-loops twice — M5). NOT textbook Newman (the second term is
a quarter of Newman's) — this is the 1e-6 comparison target, replicated
exactly.

One job: two edge-scans' worth of aggregation, vertex-sized joins, a scalar
out. The labels join is broadcast when the state table is small (late
Louvain levels) — Catalyst/AQE decides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comm_detect_spark.graph.core import volumes_df, weight_net


def modularity_terms(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community terms: (label, w_in, vol). ``labels`` = (vid, label)."""
    lab_src = labels.select(F.col("vid").alias("src"), F.col("label").alias("c_src"))
    lab_dst = labels.select(F.col("vid").alias("dst"), F.col("label").alias("c_dst"))
    w_in = (
        edges.join(lab_src, "src")
        .join(lab_dst, "dst")
        .where(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("label"))
        .agg(F.sum("weight").alias("w_in"))
    )
    vol_c = (
        volumes_df(edges)
        .join(labels, "vid")
        .groupBy("label")
        .agg(F.sum("vol").alias("vol"))
    )
    return vol_c.join(w_in, "label", "left").select(
        "label", F.coalesce(F.col("w_in"), F.lit(0)).alias("w_in"), "vol"
    )


def modularity_score(edges: DataFrame, labels: DataFrame) -> float:
    w = float(weight_net(edges))
    terms = modularity_terms(edges, labels)
    row = terms.agg(
        F.sum(
            F.col("w_in") / F.lit(w)
            - (F.col("vol") * F.col("vol")) / F.lit(4.0 * w * w)
        ).alias("q")
    ).collect()[0]
    return float(row["q"] or 0.0)


def community_conductance(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """(label, vol_w, cut_w, conductance): per-community conductance over
    a SYMMETRIC weighted edge table — the other standard partition-quality
    score next to modularity (compute_modularity above): low conductance =
    few boundary edges relative to the community's volume.

    Convention (stated, engine-replayable): vol(c) = sum of w over
    symmetric rows with src in c; cut(c) = the subset of that with dst
    outside c; conductance = cut / min(vol, total_vol - vol), NULL for a
    community with vol 0 or vol == total (no outside). Each undirected
    edge contributes twice to both numerator family and denominators, so
    the factor cancels; rounded 9.

    One labels join per endpoint (vertex-keyed, AQE hub split) + one
    map-side-combined agg over communities + a 1-row total broadcast —
    community-count-sized output."""
    la = labels.select(F.col("vid").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("label").alias("lb"))
    tagged = edges.join(la, "src").join(lb, "dst")
    per = tagged.groupBy(F.col("la").alias("label")).agg(
        F.sum("weight").alias("vol_w"),
        F.sum(
            F.when(F.col("la") != F.col("lb"), F.col("weight")).otherwise(
                F.lit(0)
            )
        ).alias("cut_w"),
    )
    total = per.agg(F.sum("vol_w").alias("tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "label",
        "vol_w",
        "cut_w",
        F.round(
            F.col("cut_w")
            / F.nullif(
                F.least(
                    F.col("vol_w").cast("double"),
                    (F.col("tot") - F.col("vol_w")).cast("double"),
                ),
                F.lit(0.0),
            ),
            9,
        ).alias("conductance"),
    )
