"""Per-partition CSR blocks in Arrow batches — the north-star execution
scheme for asynchronous (Gauss-Seidel) graph kernels.

Spark's bulk-synchronous model cannot express the reference's racy in-place
sweeps (plp.cc:96-104, plm.cc:296-314) ACROSS partitions; it can within one.
So: vertices are hash-blocked by ``pmod(src, num_blocks)``; each block's
adjacency rows (with gathered neighbor state) arrive as ONE pandas group via
``applyInPandas``; inside the block we build a local CSR (numpy indptr /
indices / weights — zero Python per row) and run the SAME sweep kernel the
NumPy oracle uses, sequentially in ascending vid order. Cross-block reads
are one sweep stale (Jacobi across blocks, Gauss-Seidel within) — the exact
analogue of the reference's cross-thread staleness, made deterministic.

``num_blocks=1`` therefore reproduces the oracle bit-for-bit; the tests pin
both that and multi-block determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from comm_detect_spark.oracle.algorithms import Adjacency


def build_block_csr(pdf: pd.DataFrame):
    """From a block's gathered adjacency rows (src, dst, weight, dst state
    columns) build:
      nodes      — ascending global vids of this block's swept nodes
      adj        — Adjacency over local ids [0..m) = nodes, [m..m+v) =
                   external (stale) neighbors
      ext_vids   — global vids of the external slots
      dst_local  — per-entry local index used to build adj
    Returns (nodes, adj, ext_vids, local_of_vid dict-free arrays).
    """
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    w = pdf["weight"].to_numpy(dtype=np.int64)
    nodes = np.unique(src)
    m = nodes.size
    # map dst -> local id: block members get their index in `nodes`,
    # externals get m + rank in the sorted external set
    is_member = np.isin(dst, nodes)
    ext_vids = np.unique(dst[~is_member])
    dst_local = np.empty(dst.size, dtype=np.int64)
    dst_local[is_member] = np.searchsorted(nodes, dst[is_member])
    dst_local[~is_member] = m + np.searchsorted(ext_vids, dst[~is_member])
    src_local = np.searchsorted(nodes, src)
    adj = Adjacency.from_entries(
        m + ext_vids.size, src_local, dst_local, w
    )
    return nodes, adj, ext_vids, dst_local
