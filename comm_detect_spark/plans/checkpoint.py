"""Checkpoint/resume for iterative vertex state (SURVEY Table C).

Iceberg-shaped API over a Parquet directory layout (this sandbox has no
Iceberg runtime jar; the store isolates that choice — swapping ``_write``/
``_read`` for ``df.writeTo(table).createOrReplace()`` + snapshot reads is the
only change needed on a real cluster).

Layout:
    <root>/<run_id>/state/iter=<k>/   — vertex-state parquet per iteration
    <root>/<run_id>/metrics.jsonl     — one row per iteration (the `runs`
                                        metrics table of SURVEY Table C)
    <root>/<run_id>/_LATEST           — atomically updated pointer

Writes are write-temp-then-rename atomic, so a killed run never leaves a
half checkpoint and resume always sees a consistent latest iteration — the
"per-partition lineage" of the north rule: each parquet file is one
partition's state, so a resume re-reads exactly the partition layout the
killed run had committed.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, root: str, run_id: str, algo: str = ""):
        self.root = root
        self.run_id = run_id
        self.algo = algo
        self.run_dir = os.path.join(root, run_id)
        os.makedirs(self.run_dir, exist_ok=True)

    # -- state ---------------------------------------------------------
    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.run_dir, "state", f"iter={iteration}")

    def save_state(self, df: DataFrame, iteration: int) -> DataFrame:
        """Persist iteration state; returns the re-read DataFrame (lineage
        truncated — the driver loop continues from the on-disk copy)."""
        path = self._iter_dir(iteration)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        with open(os.path.join(self.run_dir, "_LATEST.tmp"), "w") as fh:
            fh.write(str(iteration))
        os.replace(
            os.path.join(self.run_dir, "_LATEST.tmp"),
            os.path.join(self.run_dir, "_LATEST"),
        )
        return df.sparkSession.read.parquet(path)

    def latest_iteration(self) -> int | None:
        marker = os.path.join(self.run_dir, "_LATEST")
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return int(fh.read().strip())

    def load_state(self, spark: SparkSession, iteration: int | None = None) -> DataFrame:
        if iteration is None:
            iteration = self.latest_iteration()
        if iteration is None:
            raise FileNotFoundError(f"no checkpoint under {self.run_dir}")
        return spark.read.parquet(self._iter_dir(iteration))

    # -- metrics -------------------------------------------------------
    def log_metric(self, iteration: int, **metrics) -> None:
        rec = {
            "run_id": self.run_id,
            "algo": self.algo,
            "iteration": iteration,
            "ts": time.time(),
            **metrics,
        }
        with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def metrics(self) -> list[dict]:
        path = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
