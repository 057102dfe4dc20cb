"""Asynchronous label propagation — Arrow-CSR kernel (PLP async semantics,
plp.cc:72-114; see csr.py for the blocking scheme).

Per sweep (one Spark job):

    edges ⋈ state(src)  ⋈ state(dst)        -- gather both endpoint labels
      -> groupBy(pmod(src, num_blocks))
      -> applyInPandas(block kernel)         -- sequential CSR sweep/block,
                                                numpy gather-scatter per node
      -> count changed (fills cache)

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


def _block_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    nodes, adj, ext_vids, _ = build_block_csr(pdf)
    m = nodes.size
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    labels = np.empty(adj.n, dtype=np.int64)
    # own (live) labels for block members, stale gathered for externals
    _, first_src = np.unique(src, return_index=True)
    labels[:m] = pdf["src_label"].to_numpy(dtype=np.int64)[first_src]
    if ext_vids.size:
        order = np.argsort(dst, kind="stable")
        ext_pos = np.searchsorted(dst[order], ext_vids)
        labels[m:] = pdf["dst_label"].to_numpy(dtype=np.int64)[order][ext_pos]
    # run-decomposed vectorized sweep — output identical to the oracle's
    # per-node lpa_async_sweep (kernels.py; parity pinned in test_kernels)
    lpa_async_sweep_fast(adj, labels, m)
    return pd.DataFrame({"vid": nodes, "label": labels[:m]})


def lpa_async_step(
    edges: DataFrame, state: DataFrame, num_blocks: int
) -> DataFrame:
    """One async sweep. ``state`` = (vid, label); labels carried in GLOBAL
    label space (kernel local ids never leak)."""
    gathered = (
        edges.join(
            state.select(F.col("vid").alias("src"), F.col("label").alias("src_label")),
            "src",
        )
        .join(
            state.select(F.col("vid").alias("dst"), F.col("label").alias("dst_label")),
            "dst",
        )
        .withColumn("block", F.pmod(F.col("src"), F.lit(num_blocks)))
    )
    new_labels = gathered.groupBy("block").applyInPandas(
        lambda pdf: _block_kernel(pdf), _OUT_SCHEMA
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
    num_blocks: int = 1,
    max_iter: int | None = None,
    driver: IterationDriver | None = None,
    resume: bool = False,
) -> DataFrame:
    """Returns (vid, label). Reference stopping rule (plp.cc:90-93)."""
    drv = driver or IterationDriver()
    e = edges.persist()
    e.count()
    threshold = int(n * eps)
    resumed = drv.try_resume(spark) if resume else None
    if resumed is not None:
        state, it, hist = resumed
        updated = int(hist.get(it, {}).get("updated", n))
        updated_prev = int(hist.get(it - 1, {}).get("updated", n))
    else:
        state = drv.start(vertex_range(spark, n).withColumn("label", F.col("vid")))
        updated, updated_prev, it = n, 0, 0
    while (updated > threshold) and (abs(updated_prev - updated) > threshold):
        if max_iter is not None and it >= max_iter:
            break
        it += 1
        updated_prev = updated
        new_state = drv.prepare(lpa_async_step(e, state, num_blocks), it)
        updated = (
            new_state.withColumnRenamed("label", "l2")
            .join(state, "vid")
            .where(F.col("l2") != F.col("label"))
            .count()
        )
        state = drv.install(new_state, it, updated=updated)
    out = drv.finish(it)
    e.unpersist()
    return out
