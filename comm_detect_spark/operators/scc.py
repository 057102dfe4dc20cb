"""Strongly connected components on the DIRECTED link graph — the
directed twin of components.py (which needs a symmetrized graph). A web
graph's bow-tie structure (one giant SCC, IN/OUT tendrils) is exactly
what this decomposes.

Algorithm: trim + forward-min coloring + color-restricted backward BFS
(the FB-Trim / Orzan coloring family used by Pregel-style SCC at scale —
no reference twin; comm_detect has no directed-graph kernels). Per outer
round:

  1. TRIM to fixpoint: a vertex with in-degree 0 or out-degree 0 in the
     remaining subgraph is its own SCC. This peels the entire DAG
     periphery (the IN/OUT tendrils, usually most vertices) with
     vertex-sized semi-joins only.
  2. COLOR: propagate color(v) = min vid that reaches v, to fixpoint.
     Pointer jumping (color <- color[color]) is valid because
     reachability composes, so convergence is O(log diameter) rounds of
     one edge-sized shuffle each — the same per-round shape and cost as
     one connected-components step.
  3. EXTRACT: every color root r (color(r) == r) is the minimum vid of
     its SCC; a backward frontier BFS from all roots simultaneously,
     restricted to same-color vertices, finds exactly the SCC members
     (frontier-sized joins — cheap once the graph has been trimmed).
  4. Remove extracted SCCs and repeat on the (much smaller) remainder.

Worst case is a chain of SCCs in ascending-id order (one extraction per
round — `max_rounds` caps it and the operator raises rather than return
a wrong answer), but after trimming, real web graphs resolve in a few
rounds because the giant SCC and everything colored by small ids go in
round one.

Iterative-plan hygiene (the hard-won lesson in plans/driver.py): every
loop-carried table is localCheckpoint-ed EVERY iteration. The coloring
step references its predecessor three times (neighbor agg + two sides of
the pointer jump), so without per-iteration truncation the logical plan
grows ~3x per sweep — exponential: at checkpoint_every=4 the hand-sized
test graph already OOMed the driver on Catalyst's own plan-string
rendering. The cadence is: persist -> ONE action that both advances the
loop and fills the cache -> localCheckpoint (a cache read) -> unpersist
predecessors. Banked result rows are checkpointed at bank time so the
output never references a dropped intermediate. Coloring convergence is
detected by the monotone invariant sum(color) (labels only decrease),
which avoids a second old-vs-new join per sweep.

100 TB shape: every step is a groupBy / semi / anti join keyed on vid —
the same exchange pattern as connected_components, so the same AQE skew
story applies (the giant SCC's color concentrates like the giant
component's id in cc); the working edge table shrinks monotonically
round over round.

Semantics matched by oracle/algorithms.py::strongly_connected_components
(Kosaraju): scc id = min vid in the SCC, exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.graph.core import vertex_range


def _snap(df: DataFrame, olds: tuple[DataFrame, ...] = ()) -> DataFrame:
    """persist -> materialize -> localCheckpoint (reads the just-filled
    cache) -> drop the working cache and any predecessors. Returns a
    flat-plan frame safe to build the next iteration on."""
    pre = df.persist()
    pre.count()
    ck = pre.localCheckpoint(eager=True)
    pre.unpersist()
    for o in olds:
        o.unpersist()
    return ck


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    n: int | None = None,
    vertices: DataFrame | None = None,
    max_rounds: int = 30,
    max_iter: int = 200,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (vid BIGINT, scc BIGINT), scc = min vid in the strongly
    connected component. Deterministic (pure function of the graph)."""
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if vertices is not None:
        verts = vertices.select("vid").distinct()
    else:
        assert n is not None
        verts = vertex_range(spark, n)

    e = _snap(
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")
    )
    remaining = _snap(verts.repartition(p, "vid"))
    n_rem = remaining.count()
    banked: list[DataFrame] = []  # self-contained (vid, scc) checkpoints

    def bank(rows: DataFrame) -> None:
        banked.append(_snap(rows))

    def restrict(edge_df: DataFrame, vs: DataFrame) -> DataFrame:
        return edge_df.join(
            vs.withColumnRenamed("vid", "src"), "src", "semi"
        ).join(vs.withColumnRenamed("vid", "dst"), "dst", "semi")

    for _ in range(max_rounds):
        if n_rem == 0:
            break
        # --- 1. trim to fixpoint -------------------------------------
        while n_rem > 0:
            live = restrict(e, remaining)
            keep = _snap(
                remaining.join(
                    live.select(F.col("src").alias("vid")), "vid", "semi"
                ).join(live.select(F.col("dst").alias("vid")), "vid", "semi")
            )
            n_keep = keep.count()
            if n_keep == n_rem:
                remaining.unpersist()
                remaining = keep
                break
            bank(
                remaining.join(keep, "vid", "anti")
                .select("vid", F.col("vid").alias("scc"))
            )
            remaining.unpersist()
            remaining = keep
            n_rem = n_keep
        if n_rem == 0:
            break
        e = _snap(restrict(e, remaining), olds=(e,))

        # --- 2. forward-min color propagation to fixpoint ------------
        color = _snap(remaining.select("vid", F.col("vid").alias("color")))
        prev_sum = None
        for _cit in range(max_iter):
            nbr_min = (
                e.join(
                    color.select(
                        F.col("vid").alias("src"), F.col("color").alias("c")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.min("c").alias("nbr_c"))
            )
            merged = color.join(nbr_min, "vid", "left").select(
                "vid",
                F.least(
                    F.col("color"),
                    F.coalesce(F.col("nbr_c"), F.col("color")),
                ).alias("color"),
            )
            # pointer jump (valid: reachability composes) — same
            # semi-filtered build side + AQE story as components.py
            needed = merged.select("color").distinct()
            jump = merged.alias("a").join(
                merged.select(
                    F.col("vid").alias("color"), F.col("color").alias("jc")
                )
                .join(needed, "color", "semi")
                .alias("b"),
                "color",
                "left",
            )
            nc = jump.select(
                "vid",
                F.least(
                    F.col("color"), F.coalesce(F.col("jc"), F.col("color"))
                ).alias("color"),
            ).persist()
            # colors only decrease, so an unchanged sum IS the fixpoint;
            # this one agg both advances the loop and fills nc's cache
            cur_sum = nc.agg(F.sum("color")).collect()[0][0]
            ck = nc.localCheckpoint(eager=True)
            nc.unpersist()
            color.unpersist()
            color = ck
            if prev_sum is not None and cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError(f"scc coloring did not converge in {max_iter}")

        # --- 3. backward BFS from all roots, same-color only ----------
        # member accumulates as a flat union of checkpoint leaves — no
        # per-iteration copy of the whole membership
        frames = [_snap(color.where(F.col("vid") == F.col("color")))]
        frontier = frames[0]
        for _bit in range(max_iter):
            member = frames[0]
            for fr in frames[1:]:
                member = member.unionAll(fr)
            preds = _snap(
                e.join(
                    frontier.select(
                        F.col("vid").alias("dst"), F.col("color").alias("fc")
                    ),
                    "dst",
                )
                .select(F.col("src").alias("vid"), F.col("fc"))
                .join(color, "vid")
                .where(F.col("fc") == F.col("color"))
                .select("vid", "color")
                .distinct()
                .join(member, ["vid"], "anti")
            )
            if preds.count() == 0:
                break
            frames.append(preds)
            frontier = preds
        else:
            raise RuntimeError(
                f"scc backward BFS did not converge in {max_iter}"
            )
        member = frames[0]
        for fr in frames[1:]:
            member = member.unionAll(fr)

        bank(member.select("vid", F.col("color").alias("scc")))
        nxt_rem = _snap(
            remaining.join(member.select("vid"), "vid", "anti"),
            olds=(remaining, color),
        )
        n_rem = nxt_rem.count()
        remaining = nxt_rem
        for fr in frames:
            fr.unpersist()
        if n_rem == 0:
            break
        e = _snap(restrict(e, remaining), olds=(e,))
    else:
        raise RuntimeError(f"scc did not finish in {max_rounds} rounds")

    e.unpersist()
    remaining.unpersist()
    if not banked:  # empty vertex set
        return spark.createDataFrame([], "vid BIGINT, scc BIGINT")
    out = banked[0]
    for fr in banked[1:]:
        out = out.unionAll(fr)
    return out.select("vid", "scc")
