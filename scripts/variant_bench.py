"""A/B variants for the headline pagerank/lpa iteration shape (guide §1).

Variants (pagerank, scale-20 hi graph, 10 iters):
  pr_base   - exact current pagerank() loop shape
  pr_shj    - SHUFFLE_HASH hints on ranks-join and verts-join (no per-iter
              state broadcast through the driver, no per-iter sorts)
  pr_dang   - dangling flag carried in verts/state; dm = conditional agg
              (no per-iter semi-join + dangling broadcast build)
  pr_all    - both
Variants (lpa, 4 sweeps):
  lpa_base  - current lpa_step shape (max(struct) -> SortAggregate)
  lpa_shj   - SHUFFLE_HASH hints on both joins
  lpa_hagg  - argmax via max(s) hash-agg + filter-join (no 20M-row sort)
  lpa_all   - both
Interleaved reps, per-variant min+median, hw anchor per rep.
"""
import os, sys, time, json, statistics
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from comm_detect_spark.session import get_spark
from comm_detect_spark.graph.core import out_weights, vertex_range

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("PROF_SCALE", "20"))
EF = int(os.environ.get("PROF_EF", "12"))
ITERS = int(os.environ.get("PROF_ITERS", "10"))
SWEEPS = int(os.environ.get("PROF_SWEEPS", "4"))
REPS = int(os.environ.get("PROF_REPS", "3"))
ONLY = os.environ.get("PROF_ONLY", "")
if SCALE >= 19:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

spark = get_spark(app_name="variant-bench", cores=CPUS, shuffle_partitions=CPUS)


def hw_anchor(threads=4, units_per_thread=2):
    import numpy as np

    def burn(_):
        x = np.random.default_rng(0).random(300_000)
        for _ in range(40):
            np.sort(x)

    n_units = threads * units_per_thread
    t0 = time.perf_counter()
    with ThreadPoolExecutor(threads) as ex:
        list(ex.map(burn, range(n_units)))
    return n_units / (time.perf_counter() - t0)


from comm_detect_spark.sources.rmat import rmat_edges_distributed

n = 1 << SCALE
directed = rmat_edges_distributed(spark, SCALE, EF, num_partitions=CPUS).persist()
m = directed.count()
sym = (
    directed.select("src", "dst", "weight")
    .unionAll(directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
    .where(F.col("src") != F.col("dst"))
    .groupBy("src", "dst")
    .agg(F.sum("weight").alias("weight"))
    .persist()
)
msym = sym.count()
print(f"graph: scale={SCALE} n={n} m={m} msym={msym}", flush=True)
p = CPUS
damping = 0.85


def pr_variant(shj: bool, dangflag: bool):
    verts = vertex_range(spark, n).repartition(p, "vid").persist()
    wout = out_weights(directed)
    edges_prep = (
        directed.join(wout, "src")
        .select("src", "dst", (F.col("weight") / F.col("wout")).alias("frac"))
        .repartition(p, "src")
        .persist()
    )
    edges_prep.count()
    dangling = verts.join(
        directed.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
    ).persist()
    dangling.count()
    if dangflag:
        verts2 = (
            verts.join(dangling.withColumn("_d", F.lit(True)), "vid", "left")
            .select("vid", F.coalesce("_d", F.lit(False)).alias("dang"))
            .repartition(p, "vid")
            .persist()
        )
        verts2.count()
        state = verts2.withColumn("rank", F.lit(1.0 / n)).persist()
    else:
        state = verts.withColumn("rank", F.lit(1.0 / n)).persist()
    state.count()
    for it in range(1, ITERS + 1):
        if dangflag:
            dm_df = state.agg(
                F.coalesce(
                    F.sum(F.when(F.col("dang"), F.col("rank"))), F.lit(0.0)
                ).alias("dm")
            )
        else:
            dm_df = state.join(dangling, "vid", "semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
            )
        rside = state.select("vid", "rank").withColumnRenamed("vid", "src")
        if shj:
            rside = rside.hint("shuffle_hash")
        contribs = edges_prep.join(rside, "src").select(
            "dst", (F.col("rank") * F.col("frac")).alias("contrib")
        )
        summed = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
        sside = summed.withColumnRenamed("dst", "vid")
        if shj:
            sside = sside.hint("shuffle_hash")
        base = verts2 if dangflag else verts
        new_ranks = (
            base.join(sside, "vid", "left")
            .crossJoin(F.broadcast(dm_df))
            .select(
                "vid",
                *( ["dang"] if dangflag else [] ),
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        prepared = new_ranks.persist()
        if it % 3 == 0:
            prepared = prepared.localCheckpoint(eager=True)
        else:
            prepared.count()
        state.unpersist()
        state = prepared
    r = state.agg(F.sum("rank")).collect()[0][0]
    for df in (verts, edges_prep, dangling, state):
        df.unpersist()
    if dangflag:
        verts2.unpersist()
    return r


def lpa_variant(shj: bool, hagg: bool):
    e = sym.repartition(p, "src").persist()
    e.count()
    state = (
        vertex_range(spark, n)
        .withColumn("label", F.col("vid"))
        .repartition(p, "vid")
        .persist()
    )
    state.count()
    for it in range(1, SWEEPS + 1):
        sside = state.withColumnRenamed("vid", "src")
        if shj:
            sside = sside.hint("shuffle_hash")
        joined = e.join(sside, "src").select(
            "dst", F.col("label").alias("cand"), "weight"
        )
        joined = joined.repartition(p, "dst")
        hist = joined.groupBy(F.col("dst").alias("vid"), F.col("cand")).agg(
            F.sum("weight").alias("s")
        )
        if hagg:
            maxs = hist.groupBy("vid").agg(F.max("s").alias("ms"))
            if shj:
                maxs = maxs.hint("shuffle_hash")
            best = (
                hist.join(maxs, "vid")
                .where(F.col("s") == F.col("ms"))
                .groupBy("vid")
                .agg(F.min("cand").alias("bc"), F.max("s").alias("bs"))
            )
            bside = best
            if shj:
                bside = bside.hint("shuffle_hash")
            new_state = state.join(bside, "vid", "left").select(
                "vid",
                F.when(
                    F.col("bc").isNotNull() & (F.col("bs") > 0), F.col("bc")
                )
                .otherwise(F.col("label"))
                .alias("label"),
            )
        else:
            best = hist.groupBy("vid").agg(
                F.max(
                    F.struct(F.col("s"), (-F.col("cand")).alias("neg"))
                ).alias("m")
            )
            bside = best
            if shj:
                bside = bside.hint("shuffle_hash")
            new_state = state.join(bside, "vid", "left").select(
                "vid",
                F.when(
                    F.col("m").isNotNull() & (F.col("m.s") > 0), -F.col("m.neg")
                )
                .otherwise(F.col("label"))
                .alias("label"),
            )
        prepared = new_state.persist()
        if it % 3 == 0:
            prepared = prepared.localCheckpoint(eager=True)
        else:
            prepared.count()
        state.unpersist()
        state = prepared
    r = state.agg(F.sum("label")).collect()[0][0]
    e.unpersist()
    state.unpersist()
    return r


variants = {
    "pr_base": lambda: pr_variant(False, False),
    "pr_shj": lambda: pr_variant(True, False),
    "pr_dang": lambda: pr_variant(False, True),
    "pr_all": lambda: pr_variant(True, True),
    "lpa_base": lambda: lpa_variant(False, False),
    "lpa_shj": lambda: lpa_variant(True, False),
    "lpa_hagg": lambda: lpa_variant(False, True),
    "lpa_all": lambda: lpa_variant(True, True),
}
if ONLY:
    keep = set(ONLY.split(","))
    variants = {k: v for k, v in variants.items() if k in keep}

runs = {k: [] for k in variants}
checks = {}
anchors = []
for rep in range(REPS):
    anchors.append(round(hw_anchor(), 2))
    for name, fn in variants.items():
        t0 = time.perf_counter()
        val = fn()
        dt = time.perf_counter() - t0
        runs[name].append(round(dt, 3))
        checks.setdefault(name, val)
        print(f"rep{rep} {name}: {dt:.3f}s (check={val})", flush=True)
print("anchors:", anchors)
for name, ts in runs.items():
    print(
        f"{name}: min {min(ts):.3f}  med {statistics.median(ts):.3f}  "
        f"runs {ts}  check {checks[name]}"
    )
spark.stop()
