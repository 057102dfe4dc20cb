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

    def has_state(self, iteration: int) -> bool:
        return os.path.isdir(self._iter_dir(iteration))

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

    # -- run parameters ------------------------------------------------
    def save_params(self, *, overwrite: bool = False, **params) -> None:
        """Record output-changing run parameters (e.g. num_blocks — the
        block decomposition changes the Jacobi structure, so a resume under
        a different value silently diverges from the killed run). Write-once
        per run unless `overwrite` — a FRESH (non-resume) run reusing a
        run-id must replace the stale file so a later --resume validates
        against the run that actually produced the snapshots, not the
        previous tenant of the id; resumes keep write-once (the caller's
        mismatch check already raised if inconsistent)."""
        path = os.path.join(self.run_dir, "params.json")
        if os.path.exists(path) and not overwrite:
            return
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(params, fh)
        os.replace(tmp, path)

    def load_params(self) -> dict:
        path = os.path.join(self.run_dir, "params.json")
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            return json.load(fh)

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


def snapshot_moved_count(
    spark: SparkSession, store: CheckpointStore, iteration: int
) -> int | None:
    """EXACT reconstruction of a lost `moved`/`updated` metrics row for a
    (vid, label) state: the count of vertices whose label differs between
    snapshot ``iteration`` and ``iteration - 1`` (iteration 1 diffs against
    the singleton init label == vid).

    Why it exists: a kill can land between prepare()'s save_state (which
    advances _LATEST) and install()'s log_metric — the snapshot survives,
    its metrics row does not. With checkpoint_every=1 both adjacent
    snapshots are on disk, so the missing counter is recomputable exactly
    and resume replays the killed run's stopping/freeze state machine
    bit-identically instead of guessing. Returns None when a needed
    snapshot is absent (checkpoint_every > 1) — callers must then fall
    back conservatively."""
    from pyspark.sql import functions as F

    if not store.has_state(iteration):
        return None
    cur = store.load_state(spark, iteration)
    if iteration == 1:
        return cur.where(F.col("label") != F.col("vid")).count()
    if not store.has_state(iteration - 1):
        return None
    prev = store.load_state(spark, iteration - 1)
    return (
        cur.withColumnRenamed("label", "l2")
        .join(prev, "vid")
        .where(F.col("l2") != F.col("label"))
        .count()
    )
