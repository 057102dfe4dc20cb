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
