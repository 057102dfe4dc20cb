"""Approximate betweenness centrality — k-source Brandes, source-parallel.

No reference twin (SURVEY §2); betweenness is the standard
bridge/bottleneck centrality of link-graph analysis, and exact Brandes
(2001) is O(nm) — out of the question at web scale. The standard
approximation (Brandes-Pich 2007) runs the two Brandes passes from k
PIVOT sources and sums the dependencies; sources here are the k vertices
with the smallest (h60('{seed}:{vid}'), vid) — the repo's deterministic
uniform order (mis.py argument), so the approximation itself is
engine-replayable.

The k single-source computations run SIMULTANEOUSLY: all state is keyed
(source, vid), so each round's joins process every source's frontier in
the same shuffle — rounds = graph diameter (forward) + diameter
(backward), NOT k x diameter. Per forward round: one frontier-x-edges
join + one (s, dst) sigma-sum agg + one anti-join against the reached
set. Per backward round: one successor join + one (s, pred) dependency
agg + one delta merge — all vertex-keyed equi-joins (AQE hub splitting),
state O(k x n) rows, lineage cut per round via localCheckpoint.

Semantics: UNWEIGHTED directed shortest paths (standard Brandes; edge
weights are ignored), dependency delta[v] = sum over successors w on
shortest paths of sigma_v/sigma_w * (1 + delta_w), bc[v] = sum over the
k sources of delta (v != source), RAW (no n/k extrapolation, no
normalization — stated; consumers rescale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _h60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def betweenness_approx(
    spark: SparkSession,
    edges: DataFrame,
    k_sources: int = 4,
    seed: int = 42,
    max_depth: int = 10,
) -> DataFrame:
    """(vid BIGINT, bc DOUBLE): summed Brandes dependencies from the k
    hash-chosen pivot sources, rounded to 9 decimals. Every vertex of the
    graph appears (bc 0.0 when never intermediate)."""
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
        .persist()
    )
    sources = verts.orderBy(
        _h60(F.concat(F.lit(f"{seed}:"), F.col("vid").cast("string"))),
        "vid",
    ).limit(k_sources)

    # ---- forward: BFS levels with shortest-path counts ------------------
    frontier = sources.select(
        F.col("vid").alias("s"),
        F.col("vid"),
        F.lit(0).cast("int").alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    reached = frontier
    for t in range(1, max_depth + 1):
        cand = (
            frontier.join(e, frontier.vid == e.src)
            .groupBy("s", F.col("dst").alias("nv"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = (
            cand.join(
                reached.select("s", F.col("vid").alias("nv")),
                ["s", "nv"],
                "left_anti",
            )
            .select(
                "s",
                F.col("nv").alias("vid"),
                F.lit(t).cast("int").alias("dist"),
                "sigma",
            )
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        frontier = new
        reached = reached.unionAll(new).localCheckpoint(eager=True)

    # ---- backward: dependency accumulation level by level ---------------
    deepest = reached.agg(F.max("dist")).collect()[0][0]
    delta = reached.select(
        "s", "vid", "dist", "sigma", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=True)
    for t in range(int(deepest), 0, -1):
        succ = delta.where(F.col("dist") == t).select(
            "s",
            F.col("vid").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        succ_e = succ.join(e, succ.w == e.dst).select(
            "s", "sigma_w", "delta_w", F.col("src").alias("pv0")
        )
        prev = delta.where(F.col("dist") == t - 1).select(
            F.col("s").alias("s2"),
            F.col("vid").alias("pv"),
            F.col("sigma").alias("sigma_v"),
        )
        contrib = (
            succ_e.join(
                prev,
                (succ_e.pv0 == prev.pv) & (succ_e.s == prev.s2),
            )
            .groupBy(F.col("s"), F.col("pv").alias("vid"))
            .agg(
                F.sum(
                    F.col("sigma_v")
                    / F.col("sigma_w")
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("add")
            )
        )
        delta = (
            delta.join(contrib, ["s", "vid"], "left")
            .select(
                "s",
                "vid",
                "dist",
                "sigma",
                (F.col("delta") + F.coalesce("add", F.lit(0.0))).alias(
                    "delta"
                ),
            )
            .localCheckpoint(eager=True)
        )

    bc = (
        delta.where(F.col("vid") != F.col("s"))
        .groupBy("vid")
        .agg(F.sum("delta").alias("bc"))
    )
    # materialize, then release BOTH persisted inputs (verts previously
    # leaked its cache across bench reps — ADVICE r5)
    out = verts.join(bc, "vid", "left").select(
        "vid", F.round(F.coalesce("bc", F.lit(0.0)), 9).alias("bc")
    ).localCheckpoint(eager=True)
    e.unpersist()
    verts.unpersist()
    return out


def numpy_betweenness(edges, n, k_sources=4, seed=42, max_depth=10):
    """Independent NumPy/Python replay of betweenness_approx's contract —
    used by tests and the generated VALUES oracle (the Spark path never
    touches this code)."""
    import hashlib
    from collections import defaultdict, deque

    adj = defaultdict(list)
    radj = defaultdict(list)
    verts = set()
    for s, d in {(s, d) for s, d, *_ in edges if s != d}:
        adj[s].append(d)
        radj[d].append(s)
        verts.update((s, d))

    def h60(v):
        return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)

    sources = sorted(verts, key=lambda v: (h60(v), v))[:k_sources]
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        levels = defaultdict(list)
        levels[0].append(s)
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    levels[dist[w]].append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for t in sorted(levels, reverse=True):
            if t == 0:
                continue
            for w in levels[t]:
                for v in radj.get(w, ()):
                    if dist.get(v) == t - 1:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v, dl in delta.items():
            if v != s:
                bc[v] += dl
    return {v: round(bc.get(v, 0.0), 9) for v in verts}
