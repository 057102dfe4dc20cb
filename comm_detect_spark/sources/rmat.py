"""Distributed RMAT edge generation — in-cluster synthetic graph source.

The oracle's rmat_edges (oracle/graphs.py) draws every edge on the
DRIVER and ships the arrays to executors (bench.py does this for its
fixed scale-18/19 inputs — fine at 10^7 edges, and kept there unchanged
for cross-round comparability, but a 1.5 MB+ task-serialization
anti-pattern that cannot reach cluster scale). This source generates
the same KIND of graph (Graph500 R-MAT recurrence, Chakrabarti et al.
SDM'04) entirely executor-side: the edge id range is split into
partitions, each partition seeds PCG64(seed, partition_id) and draws
only its own edges — so generation is embarrassingly parallel, the
driver ships only (scale, edge_factor, seed), and a scale-30 (10^9
vertex) instance costs no more driver memory than a toy one.

Determinism contract: the output is a pure function of (scale,
edge_factor, seed, num_partitions) — pinned in tests by generating the
same spec twice (and across different shuffle settings). It is NOT the
same edge multiset as the oracle generator at equal seeds (different
stream layout); anything needing the oracle's exact graph (the bench's
cross-round comparable inputs) keeps using the oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rmat_edges_distributed(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src BIGINT, dst BIGINT, weight BIGINT): n * edge_factor directed
    R-MAT edges over n = 2^scale vertices, weight = multiplicity after
    collapsing duplicate draws. One mapInPandas over a range frame —
    zero driver-side edge materialization, one shuffle (the duplicate
    collapse, map-side combined)."""
    import numpy as np  # noqa: F401  (validated importable on the driver)

    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    n = 1 << scale
    m = n * edge_factor
    per = -(-m // p)  # ceil division: partition i draws its own slice
    spec = [(i, min(per, m - i * per)) for i in range(p) if i * per < m]
    parts = spark.createDataFrame(spec, "pid int, m_part long").repartition(
        len(spec), "pid"
    )
    sc, ef, av, bv, cv, sd = scale, edge_factor, a, b, c, seed

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for pid, m_part in zip(pdf["pid"], pdf["m_part"]):
                rng = np.random.Generator(
                    np.random.PCG64([int(sd), int(pid)])
                )
                m_i = int(m_part)
                src = np.zeros(m_i, dtype=np.int64)
                dst = np.zeros(m_i, dtype=np.int64)
                for bit in range(sc):
                    r = rng.random(m_i)
                    go_right = r >= av + cv
                    r2 = rng.random(m_i)
                    go_down = np.where(
                        go_right,
                        r2 >= bv / (bv + (1 - av - bv - cv)),
                        r2 >= av / (av + cv),
                    )
                    src |= go_down.astype(np.int64) << bit
                    dst |= go_right.astype(np.int64) << bit
                yield pd.DataFrame({"src": src, "dst": dst})

    edges = parts.mapInPandas(gen, "src long, dst long")
    return edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
