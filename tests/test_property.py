"""Property-based cross-checks (hypothesis): the Spark operators must equal
the NumPy oracle on RANDOM small graphs, not just the curated fixtures.
Examples are kept small (Spark jobs per example) and derandomized so CI is
deterministic; shrinking is disabled by the deadline=None profile."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from comm_detect_spark import oracle
from comm_detect_spark.graph import edges_from_numpy
from comm_detect_spark.operators.components import connected_components
from comm_detect_spark.operators.lpa import lpa_sync
from comm_detect_spark.operators.triangles import triangles_df

from tests.test_operators import to_vec

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def sym_entries(draw):
    """Random undirected multigraph as adjacency ENTRIES (both directions,
    deduped, no self loops), the reference convention."""
    n = draw(st.integers(4, 20))
    m = draw(st.integers(1, 50))
    pairs = draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=m,
            max_size=m,
        )
    )
    seen = set()
    for a, b in pairs:
        if a != b:
            seen.add((min(a, b), max(a, b)))
    if not seen:
        seen = {(0, 1)}
    src, dst = [], []
    for a, b in sorted(seen):
        src += [a, b]
        dst += [b, a]
    return n, np.asarray(src), np.asarray(dst), np.ones(len(src), dtype=np.int64)


@settings(**_SETTINGS)
@given(g=sym_entries())
def test_cc_equals_oracle_on_random_graphs(spark, g):
    n, s, d, w = g
    adj = oracle.Adjacency.from_entries(n, s, d, w)
    want = oracle.connected_components(adj)
    got = to_vec(connected_components(spark, edges_from_numpy(spark, n, s, d, w), n), n)
    assert np.array_equal(got, want)


@settings(**_SETTINGS)
@given(g=sym_entries())
def test_triangle_total_equals_oracle_on_random_graphs(spark, g):
    n, s, d, w = g
    adj = oracle.Adjacency.from_entries(n, s, d, w)
    _, want_total = oracle.triangle_counts(adj)
    got_total = triangles_df(edges_from_numpy(spark, n, s, d, w)).count()
    assert got_total == want_total


@settings(**_SETTINGS)
@given(g=sym_entries())
def test_lpa_sync_round1_equals_oracle_on_random_graphs(spark, g):
    n, s, d, w = g
    adj = oracle.Adjacency.from_entries(n, s, d, w)
    want, _ = oracle.lpa_sync(adj, max_iter=1)
    got = to_vec(
        lpa_sync(spark, edges_from_numpy(spark, n, s, d, w), n, max_iter=1), n
    )
    assert np.array_equal(got, want)


@st.composite
def doc_ids(draw):
    ids = draw(
        st.lists(st.integers(0, 10_000), min_size=2, max_size=40, unique=True)
    )
    return sorted(ids)


@settings(**_SETTINGS)
@given(ids=doc_ids())
def test_hash_split_subset_invariance(spark, ids):
    """hash_split's core contract as a PROPERTY: a document's split
    depends only on (id, seed) — any subset of the corpus assigns every
    surviving id identically (append/filter stability)."""
    from comm_detect_spark.operators.corpus import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id BIGINT")
    sub = spark.createDataFrame([(i,) for i in ids[::2]], "doc_id BIGINT")
    full = {r["id"]: r["split"] for r in hash_split(df).collect()}
    part = {r["id"]: r["split"] for r in hash_split(sub).collect()}
    assert all(full[i] == part[i] for i in part)


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=3,
        max_size=12,
    ),
    extra=st.sampled_from(["prefix", "suffix", "none"]),
)
def test_decontaminate_containment_property(spark, words, extra):
    """Any document that CONTAINS a benchmark document verbatim is flagged
    (shingle containment is monotone); a document over a disjoint
    vocabulary never is."""
    from comm_detect_spark.operators.dedup import decontaminate

    bench_text = " ".join(words)
    doc_text = {
        "prefix": "qqq www " + bench_text,
        "suffix": bench_text + " rrr sss",
        "none": bench_text,
    }[extra]
    docs = spark.createDataFrame(
        [(0, doc_text), (1, "uno dos tres cuatro cinco seis siete")],
        "doc_id BIGINT, text STRING",
    )
    bench = spark.createDataFrame([(bench_text,)], "text STRING")
    got = {
        r["id"]: r["contaminated"]
        for r in decontaminate(docs, bench, n=3).collect()
    }
    assert got[0] is True
    assert got[1] is False


@st.composite
def weighted_digraph(draw):
    """Random directed weighted edge list (no self loops, deduped)."""
    n = draw(st.integers(3, 12))
    m = draw(st.integers(1, 30))
    pairs = draw(
        st.lists(
            st.tuples(
                st.integers(0, n - 1),
                st.integers(0, n - 1),
                st.integers(1, 5),
            ),
            min_size=m,
            max_size=m,
        )
    )
    seen = {}
    for a, b, w in pairs:
        if a != b:
            seen[(a, b)] = w
    if not seen:
        seen = {(0, 1): 1}
    return n, sorted((a, b, w) for (a, b), w in seen.items())


@given(g=weighted_digraph())
@settings(**_SETTINGS)
def test_sssp_matches_bellman_ford_on_random_digraphs(spark, g):
    from comm_detect_spark.operators.sssp import sssp
    from tests.conftest import edges_df
    from tests.test_sssp import _py_bf

    n, edges = g
    e = edges_df(
        spark, n,
        [a for a, _, _ in edges],
        [b for _, b, _ in edges],
        [w for _, _, w in edges],
    )
    got = {r["vid"]: r["dist"] for r in sssp(spark, e, [0], rounds=3).collect()}
    assert got == _py_bf(edges, [0], 3)


@given(g=weighted_digraph())
@settings(**_SETTINGS)
def test_betweenness_matches_brandes_on_random_digraphs(spark, g):
    from comm_detect_spark.operators.betweenness import (
        betweenness_approx,
        numpy_betweenness,
    )
    from tests.conftest import edges_df

    n, edges = g
    e = edges_df(
        spark, n,
        [a for a, _, _ in edges],
        [b for _, b, _ in edges],
        [1] * len(edges),
    )
    got = {
        r["vid"]: r["bc"]
        for r in betweenness_approx(spark, e, k_sources=2).collect()
    }
    assert got == numpy_betweenness(
        [(a, b) for a, b, _ in edges], None, k_sources=2
    )


@given(
    keys=st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=30)
)
@settings(**_SETTINGS)
def test_cms_never_underestimates_random_keys(spark, keys):
    from collections import Counter

    from comm_detect_spark.operators.cms import cms_estimate, cms_sketch

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    sk = cms_sketch(df, "k", depth=3, width=8)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(
            sk, df.select("k").distinct(), depth=3, width=8
        ).collect()
    }
    true = Counter(keys)
    assert all(est[k] >= c for k, c in true.items())


@given(
    keys=st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=30)
)
@settings(**_SETTINGS)
def test_bloom_has_no_false_negatives_random_keys(spark, keys):
    from comm_detect_spark.operators.bloom import bloom_build, bloom_probe

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    bl = bloom_build(df, "k", num_bits=256, num_hashes=3)
    got = bloom_probe(
        bl, df.select("k").distinct(), num_bits=256, num_hashes=3
    ).collect()
    assert all(r["maybe_present"] for r in got)


@given(
    vals=st.lists(
        st.floats(-50, 50, allow_nan=False), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_histogram_counts_partition_the_input(spark, vals):
    from comm_detect_spark.operators.histogram import binned_histogram

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    h = binned_histogram(df, "v", bin_width=2.5).collect()
    assert sum(r["cnt"] for r in h) == len(vals)
    import math
    from collections import Counter

    want = Counter(math.floor(v / 2.5) for v in vals)
    assert {r["bin"]: r["cnt"] for r in h} == dict(want)


@st.composite
def _word_texts(draw):
    words = st.sampled_from(
        ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    )
    n_docs = draw(st.integers(1, 4))
    return [
        (i, " ".join(draw(st.lists(words, min_size=0, max_size=12))))
        for i in range(n_docs)
    ]


@given(texts=_word_texts())
@settings(**_SETTINGS)
def test_winnow_matches_python_replay_random_texts(spark, texts):
    """Winnowing == the pure-Python replay (hash set equality per doc) on
    random word sequences, including empty and shorter-than-k docs."""
    import hashlib
    import re

    from comm_detect_spark.operators.dedup import winnow_fingerprints

    def replay(text, k=3, w=4):
        toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        sh = [
            " ".join(toks[i : i + k])
            for i in range(max(len(toks) - k, 0) + 1)
        ]
        sh = [s for s in sh if s]
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh
        ]
        return {min(hs[i : i + w]) for i in range(len(hs))}

    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got: dict[int, set[int]] = {i: set() for i, _ in texts}
    for r in winnow_fingerprints(docs, k=3, w=4).collect():
        got[r["id"]].add(r["fp"])
    for doc_id, text in texts:
        assert got[doc_id] == replay(text), (doc_id, text)


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_ppmi_matches_python_replay_random_pairs(spark, pairs):
    """ppmi_scores == a dict replay of max(0, ln(cnt*N/(n_c*n_x))) on
    random pair tables (duplicate (center, context) rows pre-summed)."""
    import math

    from comm_detect_spark.operators.walks import ppmi_scores

    agg: dict[tuple[int, int], int] = {}
    for c, x, n in pairs:
        agg[(c, x)] = agg.get((c, x), 0) + n
    df = spark.createDataFrame(
        [(c, x, n) for (c, x), n in agg.items()],
        "center long, context long, cnt long",
    )
    n_c: dict[int, int] = {}
    n_x: dict[int, int] = {}
    for (c, x), n in agg.items():
        n_c[c] = n_c.get(c, 0) + n
        n_x[x] = n_x.get(x, 0) + n
    total = sum(agg.values())
    got = {
        (r["center"], r["context"]): r["ppmi"]
        for r in ppmi_scores(df).collect()
    }
    for (c, x), n in agg.items():
        want = round(
            max(0.0, math.log((n * float(total)) / (n_c[c] * float(n_x[x])))),
            6,
        )
        assert got[(c, x)] == want, (c, x)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2, 2, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_batch_topk_equals_singles_random_vectors(spark, vecs):
    from comm_detect_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_batch,
    )

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    k = 2
    batch: dict[int, list] = {}
    for r in brute_force_topk_batch(emb, emb.limit(2), k=k).collect():
        batch.setdefault(r["query_id"], []).append(
            (r["rnk"], r["id"], r["cosine"])
        )
    for qid, vec in [
        (r["vec_id"], r["embedding"]) for r in emb.limit(2).collect()
    ]:
        single = [
            (i + 1, r["id"], r["cosine"])
            for i, r in enumerate(brute_force_topk(emb, vec, k=k).collect())
        ]
        assert sorted(batch[qid]) == single, qid
