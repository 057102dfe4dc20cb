"""Asynchronous label propagation — Arrow-CSR kernel (PLP async semantics,
plp.cc:72-114; see csr.py for the blocking scheme).

Per sweep (one Spark job), COGROUPED so the edge table is exchanged once:

    A: edges(cached hash(src,P)) ⋈ state(vid,P)   -- NO exchange
         -> groupBy(block)                         -- THE edge-sized exchange
    B: touch(cached hash(dst,P)) ⋈ state(vid,P)   -- NO exchange
         -> groupBy(block)                         -- small (≤ one row per
                                                      (block, touched vid))
    cogroup(A, B).applyInPandas(block kernel)      -- CSR sweep per block
      -> left join state (isolated vertices keep)  -- vertex-sized

``touch`` = distinct (block, dst) — pure structure, computed once and
cached; per sweep it carries each block's stale neighbor labels WITHOUT
re-joining (and re-shuffling) the full edge table a second time. The old
formulation shuffled edge-sized data three times per sweep (src join, dst
join, block grouping); this one moves it once.

num_blocks=1 == the NumPy oracle exactly; multi-block is deterministic
(fixed block assignment + ascending sweep order), Gauss-Seidel within a
block, Jacobi across.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comm_detect_spark.graph.core import vertex_range
from comm_detect_spark.operators.csr import build_block_csr
from comm_detect_spark.operators.kernels import lpa_async_sweep_fast
from comm_detect_spark.plans.driver import IterationDriver

_OUT_SCHEMA = "vid BIGINT, label BIGINT"


def default_num_blocks(spark: SparkSession) -> int:
    """Scale-derived block count for the Arrow-CSR kernels: one block per
    shuffle partition, so the Python sweep parallelism tracks the cluster
    size. ``num_blocks=1`` is the explicitly-requested oracle-parity mode —
    it routes the WHOLE gathered edge table into a single applyInPandas
    group (one task, one core, one worker's memory) and must never be a
    silent default."""
    return max(int(spark.conf.get("spark.sql.shuffle.partitions")), 1)


def _block_kernel(edges_pdf: pd.DataFrame, labels_pdf: pd.DataFrame) -> pd.DataFrame:
    if edges_pdf.empty:
        return pd.DataFrame({"vid": [], "label": []}).astype("int64")
    nodes, adj, ext_vids, _ = build_block_csr(edges_pdf)
    m = nodes.size
    src = edges_pdf["src"].to_numpy(dtype=np.int64)
    labels = np.empty(adj.n, dtype=np.int64)
    # own (live) labels for block members, stale sweep-start for externals
    _, first_src = np.unique(src, return_index=True)
    labels[:m] = edges_pdf["src_label"].to_numpy(dtype=np.int64)[first_src]
    if ext_vids.size:
        ld = labels_pdf["dst"].to_numpy(dtype=np.int64)
        ll = labels_pdf["dst_label"].to_numpy(dtype=np.int64)
        order = np.argsort(ld)
        pos = np.searchsorted(ld[order], ext_vids)
        if pos.max(initial=-1) >= ld.size or not np.array_equal(
            ld[order][pos], ext_vids
        ):
            # an edge dst outside the vertex set would otherwise silently
            # read a DIFFERENT vertex's label via the insertion position
            raise ValueError(
                "edge dst not covered by the vertex set (n too small?)"
            )
        labels[m:] = ll[order][pos]
    # run-decomposed vectorized sweep — output identical to the oracle's
    # per-node lpa_async_sweep (kernels.py; parity pinned in test_kernels)
    lpa_async_sweep_fast(adj, labels, m)
    return pd.DataFrame({"vid": nodes, "label": labels[:m]})


def lpa_async_step(
    edges: DataFrame,
    touch: DataFrame,
    state: DataFrame,
    num_blocks: int,
    active_blocks: list[int] | None = None,
) -> DataFrame:
    """One async sweep. ``state`` = (vid, label); labels carried in GLOBAL
    label space (kernel local ids never leak). ``touch`` = distinct
    (block, dst) over the edges (precomputed by lpa_async).

    ``active_blocks`` (frontier): when given, only those blocks are
    gathered — output-identical to the full sweep (see lpa_async)."""
    if active_blocks is not None:
        edges = edges.where(
            F.pmod(F.col("src"), F.lit(num_blocks)).isin(active_blocks)
        )
        touch = touch.where(F.col("block").isin(active_blocks))
    gathered = edges.join(
        state.select(F.col("vid").alias("src"), F.col("label").alias("src_label")),
        "src",
    ).select(
        F.pmod(F.col("src"), F.lit(num_blocks)).alias("block"),
        "src",
        "dst",
        "weight",
        "src_label",
    )
    ext_labels = touch.join(
        state.select(F.col("vid").alias("dst"), F.col("label").alias("dst_label")),
        "dst",
    ).select("block", "dst", "dst_label")
    new_labels = (
        gathered.groupBy("block")
        .cogroup(ext_labels.groupBy("block"))
        .applyInPandas(_block_kernel, _OUT_SCHEMA)
    )
    # isolated vertices keep their label
    return state.join(
        new_labels.withColumnRenamed("label", "new_label"), "vid", "left"
    ).select(
        "vid", F.coalesce(F.col("new_label"), F.col("label")).alias("label")
    )


def lpa_async(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    eps: float = 1e-4,
    num_blocks: int | None = None,
    max_iter: int | None = None,
    driver: IterationDriver | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    frontier: bool = True,
) -> DataFrame:
    """Returns (vid, label). Reference stopping rule (plp.cc:90-93).

    ``num_blocks`` defaults to the shuffle-partition count (see
    default_num_blocks); pass 1 explicitly for oracle-parity mode.

    ``frontier``: after sweep 1, skip gathering blocks none of whose
    members changed or has a changed neighbor (the reference PLP's
    active-set insight, plp.cc:90-93 / the Staudt-Meyerhenke paper's
    active nodes). OUTPUT-IDENTICAL: a dominant-label decision depends
    only on neighbor labels, so a vertex with an unchanged neighborhood
    re-decides "keep"; by induction over the block's Gauss-Seidel order an
    all-inactive block performs zero moves — exactly what skipping yields
    (blocks are Jacobi-independent within a sweep). Pinned against
    frontier=False in tests."""
    if num_blocks is None:
        num_blocks = default_num_blocks(spark)
    drv = driver or IterationDriver()
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.repartition(p, "src").persist()
    e.count()
    # block -> touched-dst structure: computed once, joined per sweep
    # aliases mint fresh attribute ids — without them the cogroup's two
    # branches share `dst` from the same cached edges plan and the analyzer
    # rejects the self-join as ambiguous
    touch = (
        e.select(
            F.pmod(F.col("src"), F.lit(num_blocks)).alias("block"),
            F.col("dst").alias("dst"),
        )
        .distinct()
        .repartition(p, "dst")
        .persist()
    )
    touch.count()
    threshold = int(n * eps)
    # pin num_blocks (output-changing: Jacobi block structure) — resume on
    # a session resolving a different default must fail, not diverge
    if drv.store is not None:
        saved = drv.store.load_params()
        if resume and saved.get("num_blocks") not in (None, num_blocks):
            raise ValueError(
                f"resume with num_blocks={num_blocks} but the killed run "
                f"used num_blocks={saved['num_blocks']} "
                f"({drv.store.run_dir}/params.json)"
            )
        drv.store.save_params(
            num_blocks=num_blocks, eps=eps, overwrite=not resume
        )
    resumed = drv.try_resume(spark) if resume else None
    if resumed is not None:
        state, it, hist = resumed

        def _counter(it2: int, default: int) -> int:
            # a kill between save_state and log_metric loses the row; the
            # count is recomputable EXACTLY from the adjacent snapshots
            row = hist.get(it2)
            if row is not None and "updated" in row:
                return int(row["updated"])
            from comm_detect_spark.plans.checkpoint import snapshot_moved_count

            rec = snapshot_moved_count(spark, drv.store, it2)
            return default if rec is None else rec

        updated = _counter(it, n)
        updated_prev = _counter(it - 1, n) if it > 1 else n
    else:
        state = drv.start(
            vertex_range(spark, n)
            .withColumn("label", F.col("vid"))
            .repartition(p, "vid")
        )
        updated, updated_prev, it = n, 0, 0
    active_blocks: list[int] | None = None
    while (updated > threshold) and (abs(updated_prev - updated) > threshold):
        if max_iter is not None and it >= max_iter:
            break
        it += 1
        updated_prev = updated
        new_state = drv.prepare(
            lpa_async_step(e, touch, state, num_blocks, active_blocks), it
        )
        delta = (
            new_state.withColumnRenamed("label", "l2")
            .join(state, "vid")
            .where(F.col("l2") != F.col("label"))
        )
        updated = delta.count()  # the one action that fills the cache
        # adaptive gate (see louvain._local_move): the active-set join is
        # overhead while the graph churns; hunt for skippable blocks only
        # in the convergence tail (movers < n/8)
        if frontier and 0 < updated < max(n // 8, 1) and num_blocks > 1:
            changed = delta.select(F.col("vid").alias("dst"))
            blocks = (
                changed.select(
                    F.pmod(F.col("dst"), F.lit(num_blocks)).alias("block")
                )
                .unionAll(touch.join(changed, "dst").select("block"))
                .distinct()
                .collect()  # ≤ num_blocks rows — driver-size safe
            )
            active = sorted(int(r["block"]) for r in blocks)
            active_blocks = None if len(active) >= num_blocks else active
        else:
            active_blocks = None
        state = drv.install(new_state, it, updated=updated)
    out = drv.finish(it)
    e.unpersist()
    touch.unpersist()
    return out
