"""Late-round-6 operator gates: global transitivity, avg-neighbor-degree
profile, PageRank convergence trace, graded n-gram contamination,
winnowing fingerprints, bigram PMI — each checked against hand-computed
or NumPy/Python-replayed expectations on tiny known inputs (the
cross-engine DuckDB side-by-side lives in test_entry.py)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1) for a, b in pairs],
        "src long, dst long, weight long",
    )


# triangle 1-2-3 plus pendant 3-4: degrees 2,2,3,1; wedges 1+1+3+0 = 5,
# one triangle, transitivity 3/5
_TRI_PENDANT = [(1, 2), (2, 3), (1, 3), (3, 4)]


def test_global_transitivity_exact(spark):
    from comm_detect_spark.operators.graphstats import global_transitivity

    row = global_transitivity(_edges(spark, _TRI_PENDANT)).collect()[0]
    assert row["wedges"] == 5
    assert row["triangles"] == 1
    assert row["transitivity"] == pytest.approx(0.6)


def test_global_transitivity_triangle_free_and_no_wedge(spark):
    from comm_detect_spark.operators.graphstats import global_transitivity

    # star: 3 wedges, 0 triangles -> 0.0
    row = global_transitivity(
        _edges(spark, [(0, 1), (0, 2), (0, 3)])
    ).collect()[0]
    assert (row["wedges"], row["triangles"], row["transitivity"]) == (3, 0, 0.0)
    # single edge: no wedge -> NULL (try_divide), not a crash
    row = global_transitivity(_edges(spark, [(7, 8)])).collect()[0]
    assert row["wedges"] == 0 and row["transitivity"] is None


def test_avg_neighbor_degree_exact(spark):
    from comm_detect_spark.operators.graphstats import avg_neighbor_degree

    got = {
        r["deg"]: (r["n_vertices"], r["knn"])
        for r in avg_neighbor_degree(_edges(spark, _TRI_PENDANT)).collect()
    }
    assert got == {
        1: (1, 3.0),          # vertex 4 -> neighbor 3 (deg 3)
        2: (2, 2.5),          # vertices 1,2 -> neighbors of degree 2 and 3
        3: (1, pytest.approx(round(5 / 3, 6))),  # vertex 3 -> 2,2,1
    }


def test_avg_neighbor_degree_ignores_direction_loops_multiplicity(spark):
    from comm_detect_spark.operators.graphstats import avg_neighbor_degree

    base = avg_neighbor_degree(_edges(spark, _TRI_PENDANT)).collect()
    noisy = avg_neighbor_degree(
        _edges(spark, _TRI_PENDANT + [(2, 1), (3, 3), (1, 2)])
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, noisy))


def test_pagerank_trace_matches_numpy_replay(spark):
    from comm_detect_spark.operators.pagerank import pagerank_trace

    pairs = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]  # 2 is NOT dangling; 5 absent
    e = _edges(spark, pairs)
    verts = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5]], "vid long")
    got = {
        r["iter"]: r["l1_delta"]
        for r in pagerank_trace(spark, e, verts, iterations=3).collect()
    }
    # vertex 5 is dangling (in verts, no out-edge)
    want = _numpy_pr_trace_with_verts(pairs, [1, 2, 3, 4, 5], 3)
    assert set(got) == {1, 2, 3}
    for i in (1, 2, 3):
        assert got[i] == pytest.approx(round(want[i - 1], 9), abs=1e-9)


def _numpy_pr_trace_with_verts(pairs, verts, n_iter, damping=0.85):
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    wout = {}
    for s, _ in pairs:
        wout[s] = wout.get(s, 0) + 1
    r = [1.0 / n] * n
    out = []
    for _ in range(n_iter):
        dm = sum(r[idx[v]] for v in verts if v not in wout)
        contrib = [0.0] * n
        for s, d in pairs:
            contrib[idx[d]] += r[idx[s]] / wout[s]
        nr = [(1 - damping) / n + damping * (c + dm / n) for c in contrib]
        out.append(sum(abs(a - b) for a, b in zip(nr, r)))
        r = nr
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_contamination_exact(spark):
    from comm_detect_spark.operators.dedup import ngram_contamination

    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),   # shingles: 3, one leaked
            (2, "totally clean text here now"), # 3 shingles, zero hits
            (3, ""),                            # no shingles
        ],
    )
    bench = _docs(spark, [(100, "a quick brown fox appears")])
    got = {
        r["id"]: (r["n_shingles"], r["n_hit"], r["contamination"])
        for r in ngram_contamination(corpus, bench, n=3).collect()
    }
    assert got[1] == (3, 1, pytest.approx(round(1 / 3, 6)))
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (0, 0, None)


def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = 3, w: int = 4) -> set[int]:
    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    n = len(toks)
    sh = [
        " ".join(toks[i : i + k]) for i in range(max(n - k, 0) + 1)
    ]
    sh = [s for s in sh if s]
    hs = [_h60_py(s) for s in sh]
    return {min(hs[i : i + w]) for i in range(len(hs))}


def test_winnow_fingerprints_matches_python_replay(spark):
    from comm_detect_spark.operators.dedup import winnow_fingerprints

    texts = [
        (1, "a b c d e f g h i j k l m"),
        (2, "one two three"),
        (3, "Shared   Run of words x y z q r s t u v"),
    ]
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(_docs(spark, texts), k=3, w=4).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    for doc_id, text in texts:
        assert got[doc_id] == _py_winnow(text), doc_id


def test_winnow_shared_run_guarantee(spark):
    from comm_detect_spark.operators.dedup import winnow_fingerprints

    # two docs sharing a run of w+k-1 = 6 words must share >= 1 fingerprint
    run = "alpha beta gamma delta epsilon zeta"
    docs = _docs(
        spark,
        [(1, f"prefix words here {run}"), (2, f"{run} completely other tail")],
    )
    fps: dict[int, set[int]] = {1: set(), 2: set()}
    for r in winnow_fingerprints(docs, k=3, w=4).collect():
        fps[r["id"]].add(r["fp"])
    assert fps[1] & fps[2]


def test_bigram_pmi_exact(spark):
    from comm_detect_spark.operators.ranking import bigram_pmi

    # "a b" x5 (as "a b c" docs also feed "b c" x5), plus "a d" x5
    docs = _docs(
        spark,
        [(i, "a b c") for i in range(5)] + [(i + 10, "a d") for i in range(5)],
    )
    got = {r["bigram"]: (r["n"], r["pmi"]) for r in bigram_pmi(docs, min_count=5).collect()}
    # N=15 bigrams: "a b":5, "b c":5, "a d":5. left: a:10, b:5. right: b:5, c:5, d:5.
    assert got["a b"] == (5, pytest.approx(round(math.log(5 * 15 / (10 * 5)), 6)))
    assert got["b c"] == (5, pytest.approx(round(math.log(5 * 15 / (5 * 5)), 6)))
    assert got["a d"] == (5, pytest.approx(round(math.log(5 * 15 / (10 * 5)), 6)))


def test_bigram_pmi_min_count_floor(spark):
    from comm_detect_spark.operators.ranking import bigram_pmi

    docs = _docs(spark, [(1, "rare pair"), (2, "a b"), (3, "a b")])
    got = {r["bigram"] for r in bigram_pmi(docs, min_count=2).collect()}
    assert got == {"a b"}


# ---------------------------------------------------------------------------
# plan shape + cache release for the late-r6 batch
# ---------------------------------------------------------------------------


def test_winnow_plan_one_exchange_no_python(spark):
    """The positional-shingle explode co-locates nothing; the ONLY shuffle
    is the window's hash exchange on id, which the downstream distinct
    (grouping on (id, fp) — a superset of the partitioning key) reuses.
    Everything stays JVM-side."""
    from tests.test_plans import live_exchange_count, plan_of

    from comm_detect_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    plan = plan_of(winnow_fingerprints(docs, k=3, w=4))
    assert live_exchange_count(plan) == 1, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_transitivity_and_pmi_plans_no_cartesian_no_python(spark):
    from tests.test_plans import plan_of

    from comm_detect_spark.operators.graphstats import global_transitivity
    from comm_detect_spark.operators.ranking import bigram_pmi

    plan = plan_of(global_transitivity(_edges(spark, _TRI_PENDANT)))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    docs = _docs(spark, [(1, "a b c"), (2, "a b")])
    plan = plan_of(bigram_pmi(docs, min_count=1))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_pagerank_trace_releases_caches(spark):
    import time

    from comm_detect_spark.operators.pagerank import pagerank_trace

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    e = _edges(spark, [(i, (i + 1) % 20) for i in range(20)])
    verts = spark.createDataFrame([(i,) for i in range(20)], "vid long")
    out = pagerank_trace(spark, e, verts, iterations=2)
    assert out.count() == 2
    # unpersist is non-blocking; poll briefly for the release to land
    for _ in range(20):
        if jsc.getPersistentRDDs().size() - before <= 0:
            break
        time.sleep(0.25)
    assert jsc.getPersistentRDDs().size() - before <= 0


# ---------------------------------------------------------------------------
# warm-start connected components (crawl-refresh delta path)
# ---------------------------------------------------------------------------


def _cc(spark, pairs, verts_ids, **kw):
    from comm_detect_spark.operators.components import connected_components

    sym = []
    for a, b in pairs:
        sym += [(a, b), (b, a)]
    e = _edges(spark, sym)
    verts = spark.createDataFrame([(v,) for v in verts_ids], "vid long")
    return {
        r["vid"]: r["comp"]
        for r in connected_components(spark, e, vertices=verts, **kw).collect()
    }


def test_cc_warm_equals_cold_after_edge_addition(spark):
    from comm_detect_spark.operators.components import connected_components

    verts = list(range(8))
    old_pairs = [(0, 1), (1, 2), (4, 5), (6, 7)]   # comps {0,1,2} {3} {4,5} {6,7}
    cold_old = _cc(spark, old_pairs, verts)
    assert cold_old == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6, 7: 6}
    # crawl refresh: bridge 2-4 and attach new vertex 8 to 7
    new_pairs = old_pairs + [(2, 4), (7, 8)]
    new_verts = verts + [8]
    cold_new = _cc(spark, new_pairs, new_verts)
    sym = []
    for a, b in new_pairs:
        sym += [(a, b), (b, a)]
    init = spark.createDataFrame(
        [(v, c) for v, c in cold_old.items()], "vid long, comp long"
    )
    warm = {
        r["vid"]: r["comp"]
        for r in connected_components(
            spark,
            _edges(spark, sym),
            vertices=spark.createDataFrame(
                [(v,) for v in new_verts], "vid long"
            ),
            init=init,
        ).collect()
    }
    assert warm == cold_new
    assert warm[4] == 0 and warm[8] == 6


def test_cc_warm_drops_stale_labels_on_pruned_crawl(spark):
    from comm_detect_spark.operators.components import connected_components

    # old labeling said comp(1)=comp(2)=0, but vertex 0 is gone from the
    # new crawl (NOT an edge removal: the 1-2 edge survives) — the stale
    # label 0 must not leak into the output
    init = spark.createDataFrame(
        [(1, 0), (2, 0)], "vid long, comp long"
    )
    got = {
        r["vid"]: r["comp"]
        for r in connected_components(
            spark,
            _edges(spark, [(1, 2), (2, 1)]),
            vertices=spark.createDataFrame([(1,), (2,)], "vid long"),
            init=init,
        ).collect()
    }
    assert got == {1: 1, 2: 1}


def test_cc_warm_idempotent_one_round(spark):
    from comm_detect_spark.operators.components import connected_components

    pairs = [(0, 1), (1, 2), (3, 4)]
    verts = list(range(5))
    cold = _cc(spark, pairs, verts)
    sym = []
    for a, b in pairs:
        sym += [(a, b), (b, a)]
    init = spark.createDataFrame(
        [(v, c) for v, c in cold.items()], "vid long, comp long"
    )
    warm1 = {
        r["vid"]: r["comp"]
        for r in connected_components(
            spark,
            _edges(spark, sym),
            vertices=spark.createDataFrame([(v,) for v in verts], "vid long"),
            rounds=1,
            init=init,
        ).collect()
    }
    assert warm1 == cold


# ---------------------------------------------------------------------------
# batch ANN baseline + PPMI
# ---------------------------------------------------------------------------


def test_batch_topk_equals_per_query_brute_force(spark):
    import numpy as np

    from comm_detect_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_batch,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id") % 13 == 0)  # 0, 13, 26, 39
    batch = {}
    for r in brute_force_topk_batch(emb, queries, k=4).collect():
        batch.setdefault(r["query_id"], []).append(
            (r["rnk"], r["id"], r["cosine"])
        )
    for qid, vec in [(r["vec_id"], r["embedding"]) for r in queries.collect()]:
        single = [
            (i + 1, r["id"], r["cosine"])
            for i, r in enumerate(brute_force_topk(emb, vec, k=4).collect())
        ]
        assert sorted(batch[qid]) == single, qid


def test_batch_topk_plan_windowgrouplimit_and_broadcast(spark):
    """The rnk <= k filter must push top-k into the per-partition sort
    (WindowGroupLimit) and the query side must broadcast — the two plan
    properties that make the one-pass batch shape hold at corpus scale."""
    from tests.test_plans import plan_of

    from comm_detect_spark.operators.similarity import brute_force_topk_batch

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    plan = plan_of(brute_force_topk_batch(emb, emb.limit(2), k=2))
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ppmi_exact_tiny(spark):
    from comm_detect_spark.operators.walks import ppmi_scores

    pairs = spark.createDataFrame(
        [(1, 2, 4), (1, 3, 1), (2, 1, 4), (3, 1, 1)],
        "center long, context long, cnt long",
    )
    # N=10; margins: center 1->5, 2->4, 3->1; context 2->4, 3->1, 1->5
    got = {
        (r["center"], r["context"]): r["ppmi"]
        for r in ppmi_scores(pairs).collect()
    }
    assert got[(1, 2)] == pytest.approx(round(max(0.0, math.log(4 * 10 / (5 * 4))), 6))
    assert got[(2, 1)] == pytest.approx(round(max(0.0, math.log(4 * 10 / (4 * 5))), 6))
    assert got[(1, 3)] == pytest.approx(round(max(0.0, math.log(1 * 10 / (5 * 1))), 6))
    # negative PMI clamps to 0: construct one
    assert all(v >= 0 for v in got.values())


def test_ppmi_min_count_and_clamp(spark):
    from comm_detect_spark.operators.walks import ppmi_scores

    # (1,2) has pmi ln(1*N/(n_c*n_x)) with big margins -> negative -> 0
    pairs = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 9), (4, 2, 9)],
        "center long, context long, cnt long",
    )
    got = {
        (r["center"], r["context"]): r["ppmi"]
        for r in ppmi_scores(pairs, min_count=1).collect()
    }
    # N=19, n_c(1)=10, n_x(2)=10 -> ln(19/100) < 0 -> clamped
    assert got[(1, 2)] == 0.0
    filtered = ppmi_scores(pairs, min_count=2).collect()
    assert all(r["cnt"] >= 2 for r in filtered)
