"""Iteration plumbing shared by every iterative operator.

Spark-specific care for driver-side ``while`` loops (SURVEY §3.4):

* each iteration's state is persisted and materialized before the previous
  one is unpersisted (otherwise the new plan recomputes the whole chain);
* lineage is truncated every ``checkpoint_every`` iterations — either into a
  CheckpointStore (resumable, Iceberg-shaped) or via localCheckpoint
  (fast, non-resumable) — so the logical plan does not grow linearly with
  iteration count (plan-growth is the classic driver-loop failure at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from comm_detect_spark.plans.checkpoint import CheckpointStore


class IterationDriver:
    def __init__(
        self,
        store: CheckpointStore | None = None,
        checkpoint_every: int = 1,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        materialize_every: int = 1,
    ):
        # checkpoint_every=1: truncate lineage EVERY iteration. Anything
        # sparser lets the logical plan deepen linearly with iteration count
        # until Catalyst's own tree traversals dominate runtime (observed:
        # jazz Louvain went 30s -> 700s+ from plan growth alone).
        #
        # materialize_every=m>1 (fixed-iteration step() callers only):
        # chain m iterations into ONE Spark job — intermediate states are
        # neither persisted nor counted, so the per-iteration fixed driver
        # cost (job launch + Catalyst analysis, measured ~1.4 s/iter on
        # this host, scaling_bench r6) is paid once per m iterations.
        # Result is bit-identical to m single steps (pytest-pinned).
        # MEASURED (scale-18 RMAT, 8 cores, BENCH/lpa_fixed_rounds_r6.json):
        # LPA sync m=3 is 2.2x SLOWER than per-sweep materialization —
        # lpa_step references its input state TWICE (edge join + keep-label
        # join), so the unmaterialized chain re-evaluates geometrically;
        # pagerank m=3 measured ~8% slower for the same reason (3-fold
        # fan-out). An earlier note here claimed LPA m=3 was 12% faster;
        # that was recorded when lpa_sync's counting loop (prepare/install)
        # silently ignored materialize_every, so the chain never engaged —
        # retracted once the r6 fixed-rounds step() path made it real.
        # Default stays 1; only a recurrence that reads its state ONCE per
        # step can win from chaining, and no current operator qualifies.
        # Incompatible with a CheckpointStore (resumable runs snapshot
        # per iteration) and with callers that run their own changed-count
        # action per iteration (prepare/install — they need per-iter
        # materialization by definition).
        if store is not None and materialize_every != 1:
            raise ValueError(
                "materialize_every > 1 requires store=None (resumable "
                "runs materialize per iteration)"
            )
        self.store = store
        self.checkpoint_every = checkpoint_every
        self.storage_level = storage_level
        self.materialize_every = materialize_every
        self._current: DataFrame | None = None
        self._pending: DataFrame | None = None
        # feeder cache of a not-yet-materialized lazy localCheckpoint
        # (install() truncation path); released once the checkpoint blocks
        # exist — see install()/finish()
        self._lazy_ckpt_cache: DataFrame | None = None

    def start(self, state: DataFrame, iteration: int = 0) -> DataFrame:
        self._current = state.persist(self.storage_level)
        self._current.count()
        return self._current

    def try_resume(self, spark) -> tuple[DataFrame, int, dict] | None:
        """If the store holds a snapshot, install it as the current state.
        Returns (state, iteration_of_snapshot, {iteration: metrics_row}) so
        the caller can reseed its stopping-rule counters; None when there is
        nothing to resume (no store / no snapshot)."""
        if self.store is None:
            return None
        latest = self.store.latest_iteration()
        if latest is None:
            return None
        state = self.start(self.store.load_state(spark), latest)
        # finish() logs a second, counter-less row per iteration
        # (final=True); it must not shadow the row holding the counters
        history = {
            m["iteration"]: m
            for m in self.store.metrics()
            if not m.get("final")
        }
        return state, latest, history

    def prepare(self, new_state: DataFrame, iteration: int) -> DataFrame:
        """Persist (NOT materialized) the next iteration's state. The caller
        should run exactly one action against the returned frame (e.g. the
        changed-rows count) — that action fills the cache — then call
        install(). Keeps each iteration at ONE Spark job."""
        truncate = iteration % self.checkpoint_every == 0
        if truncate and self.store is not None:
            new_state = self.store.save_state(new_state, iteration)
        return new_state.persist(self.storage_level)

    def install(self, prepared: DataFrame, iteration: int, **metrics) -> DataFrame:
        """Swap in a state returned by prepare() after the caller's action.

        r7 (guide §1/§5): on truncation iterations the lineage cut is a
        LAZY localCheckpoint — the next iteration's own action (or
        finish()) materializes the checkpoint blocks straight out of the
        cache the caller's action just filled, so the dedicated
        read-cache-write-blocks job the eager cut used to run per
        iteration disappears. The pre-checkpoint cache must stay alive
        until that materialization happens, so its release is deferred to
        the next install()/finish() (``_lazy_ckpt_cache``)."""
        truncate = iteration % self.checkpoint_every == 0
        pre_ckpt = None
        if truncate and self.store is None:
            pre_ckpt = prepared
            prepared = prepared.localCheckpoint(eager=False)
        if self._current is not None:
            self._current.unpersist()
        if self._lazy_ckpt_cache is not None:
            # the previous lazy checkpoint has been materialized by the
            # caller's action this iteration — its feeder cache can go
            self._lazy_ckpt_cache.unpersist()
            self._lazy_ckpt_cache = None
        self._lazy_ckpt_cache = pre_ckpt
        self._current = prepared
        if self.store is not None:
            self.store.log_metric(iteration, **metrics)
        return prepared

    def step(self, new_state: DataFrame, iteration: int, **metrics) -> DataFrame:
        """prepare + materialize + install, for callers with no action of
        their own. With materialize_every=m > 1, m-1 of every m steps
        chain lazily (no job) and the m-th materializes the whole chain
        at once; the last materialized cache stays hot underneath the
        chain so nothing recomputes."""
        if (
            self.materialize_every > 1
            and iteration % self.materialize_every != 0
        ):
            self._pending = new_state
            return new_state
        # NOTE (r7): a "fold" that localCheckpoint(eager)s the RAW new_state
        # directly (skipping prepare+count) was tried and REVERTED: the
        # checkpointed LogicalRDD then inherits the raw tree's ESTIMATED
        # stats, which compound multiplicatively across iterations (each
        # round's leaf stats are the previous round's product), until the
        # optimizer's stats arithmetic (InjectRuntimeFilter size checks)
        # grinds on million-bit BigIntegers — test_mis went from ~50 s to
        # a multi-hour hang. Going through prepare+count first means the
        # checkpoint wraps the MATERIALIZED cache, whose real, bounded
        # size resets the stats every iteration; the lazy cut in install()
        # already makes the checkpoint job-free, so one job per iteration
        # is achieved without the fold.
        prepared = self.prepare(new_state, iteration)
        prepared.count()
        self._pending = None
        return self.install(prepared, iteration, **metrics)

    def finish(self, iteration: int, **metrics) -> DataFrame:
        if self._pending is not None:
            # the loop ended on a lazy step — materialize the tail chain
            prepared = self.prepare(self._pending, iteration)
            prepared.count()
            self._pending = None
            self.install(prepared, iteration)
        assert self._current is not None
        if self._lazy_ckpt_cache is not None:
            # the loop ended right after a lazy truncation: materialize the
            # checkpoint from the still-live cache, then release it
            self._current.count()
            self._lazy_ckpt_cache.unpersist()
            self._lazy_ckpt_cache = None
        if self.store is not None:
            final = self.store.save_state(self._current, iteration)
            self.store.log_metric(iteration, final=True, **metrics)
            self._current.unpersist()
            return final
        return self._current
