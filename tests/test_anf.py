"""ANF (Flajolet-Martin neighborhood sketches) — exact cross-checks against
a pure-Python simulation using the same md5 hash, plus estimator sanity.

The FM pipeline is fully deterministic (md5-seeded, union = bitwise OR), so
the sketch/b_sum path is checked for EXACT equality, not tolerance."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from comm_detect_spark.operators.anf import (
    FM_PHI,
    anf_b_sum,
    anf_estimates,
    anf_sketches,
    effective_diameter,
    fm_sketch_init,
    neighborhood_function,
)
from tests.conftest import edges_df


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_init(vids, trials):
    out = {}
    for v in vids:
        for t in range(trials):
            h = _h60(f"{v}:{t}")
            out[(v, t)] = h & -h
    return out


def _py_anf(vids, edges, hops, trials):
    """Reference simulation: hops rounds of src->dst OR propagation."""
    sk = _py_init(vids, trials)
    for _ in range(hops):
        new = dict(sk)
        for s, d in edges:
            for t in range(trials):
                new[(d, t)] |= sk[(s, t)]
        sk = new
    return sk


def _py_b_sum(sk, vids, trials):
    out = {}
    for v in vids:
        tot = 0
        for t in range(trials):
            s = sk[(v, t)]
            r = (-1 - s) & (s + 1)
            tot += r.bit_length() - 1
        out[v] = tot
    return out


@pytest.fixture(scope="module")
def small_graph(spark):
    """Deterministic sparse digraph on 30 vertices (md5-derived)."""
    vids = list(range(30))
    edges = []
    for v in vids:
        for j in range(3):
            d = _h60(f"e:{v}:{j}") % 30
            if d != v:
                edges.append((v, d))
    edges = sorted(set(edges))
    src = [e[0] for e in edges]
    dst = [e[1] for e in edges]
    e = edges_df(spark, 30, src, dst, [1] * len(edges))
    v = spark.range(30).select(F.col("id").alias("vid"))
    return vids, edges, e, v


def test_fm_init_exact(spark, small_graph):
    vids, _, _, v = small_graph
    got = {
        (r["vid"], r["trial"]): r["sketch"]
        for r in fm_sketch_init(v, trials=4).collect()
    }
    want = _py_init(vids, 4)
    assert got == want
    # every sketch is a power of two (exactly one bit set)
    assert all(s > 0 and (s & (s - 1)) == 0 for s in got.values())


def test_anf_sketches_exact(spark, small_graph):
    vids, edges, e, v = small_graph
    got = {
        (r["vid"], r["trial"]): r["sketch"]
        for r in anf_sketches(spark, e, v, hops=3, trials=4).collect()
    }
    want = _py_anf(vids, edges, 3, 4)
    assert got == want


def test_anf_b_sum_exact(spark, small_graph):
    vids, edges, e, v = small_graph
    sk = anf_sketches(spark, e, v, hops=3, trials=4)
    got = {r["vid"]: r["b_sum"] for r in anf_b_sum(sk).collect()}
    want = _py_b_sum(_py_anf(vids, edges, 3, 4), vids, 4)
    assert got == want


def test_saturation_on_connected_component(spark):
    """After >= diameter hops on a symmetric cycle, every vertex's sketch is
    the OR of ALL initial sketches — the union of the whole component."""
    n = 12
    src = list(range(n)) + [(i + 1) % n for i in range(n)]
    dst = [(i + 1) % n for i in range(n)] + list(range(n))
    e = edges_df(spark, n, src, dst, [1] * len(src))
    v = e.sparkSession.range(n).select(F.col("id").alias("vid"))
    sk = anf_sketches(spark, e, v, hops=n, trials=4).collect()
    init = _py_init(range(n), 4)
    for t in range(4):
        full = 0
        for i in range(n):
            full |= init[(i, t)]
        for r in sk:
            if r["trial"] == t:
                assert r["sketch"] == full


def test_estimates_monotone_and_sane(spark):
    """Path graph 0-1-...-19, symmetric: per-hop pair-count estimates are
    nondecreasing and within a small factor of the exact N(h)."""
    n = 20
    src = list(range(n - 1)) + list(range(1, n))
    dst = list(range(1, n)) + list(range(n - 1))
    e = edges_df(spark, n, src, dst, [1] * len(src))
    v = e.sparkSession.range(n).select(F.col("id").alias("vid"))
    nf = neighborhood_function(spark, e, v, max_hops=4, trials=32)
    vals = [x for _, x in nf]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    # exact ordered-pair counts (self-pairs included) on a path
    for h, est in nf:
        exact = sum(
            min(n - 1, i + h) - max(0, i - h) + 1 for i in range(n)
        )
        assert 0.3 * exact <= est <= 3.0 * exact, (h, est, exact)


def test_estimates_deterministic(spark, small_graph):
    _, _, e, v = small_graph
    sk = anf_sketches(spark, e, v, hops=2, trials=8)
    a = sorted(
        (r["vid"], round(r["est_size"], 9))
        for r in anf_estimates(sk, 8).collect()
    )
    sk2 = anf_sketches(spark, e, v, hops=2, trials=8)
    b = sorted(
        (r["vid"], round(r["est_size"], 9))
        for r in anf_estimates(sk2, 8).collect()
    )
    assert a == b


def test_effective_diameter_interpolation():
    nf = [(1, 10.0), (2, 50.0), (3, 100.0), (4, 100.0)]
    # q=0.9 -> target 90, between h=2 (50) and h=3 (100): 2 + 40/50 = 2.8
    assert abs(effective_diameter(nf, q=0.9) - 2.8) < 1e-9
    # plateau: q=1.0 target 100 reached exactly at h=3
    assert abs(effective_diameter(nf, q=1.0) - 3.0) < 1e-9
    assert effective_diameter([], q=0.9) == 0.0


def _py_hop_b_sums(vids, edges, hops, trials):
    sk = _py_init(vids, trials)
    out = {}
    for h in range(1, hops + 1):
        new = dict(sk)
        for s, d in edges:
            for t in range(trials):
                new[(d, t)] |= sk[(s, t)]
        sk = new
        for v, b in _py_b_sum(sk, vids, trials).items():
            out[(v, h)] = b
    return out


def test_hop_b_sums_exact(spark, small_graph):
    from comm_detect_spark.operators.anf import anf_hop_b_sums

    vids, edges, e, v = small_graph
    got = {
        (r["vid"], r["hop"]): r["b_sum"]
        for r in anf_hop_b_sums(spark, e, v, hops=3, trials=4).collect()
    }
    assert got == _py_hop_b_sums(vids, edges, 3, 4)


def test_harmonic_matches_simulation(spark, small_graph):
    """harmonic_centrality == the same formula computed from the exact
    pure-Python FM simulation (float tolerance only)."""
    import math

    from comm_detect_spark.operators.anf import FM_PHI, harmonic_centrality

    vids, edges, e, v = small_graph
    trials, hops = 8, 3
    got = {
        r["vid"]: r["harmonic"]
        for r in harmonic_centrality(
            spark, e, v, max_hops=hops, trials=trials
        ).collect()
    }
    sk = _py_init(vids, trials)
    est = {(v_, 0): 2 ** (_py_b_sum(sk, vids, trials)[v_] / trials) / FM_PHI
           for v_ in vids}
    cur = sk
    for h in range(1, hops + 1):
        new = dict(cur)
        for s, d in edges:
            for t in range(trials):
                new[(d, t)] |= cur[(s, t)]
        cur = new
        for v_, b in _py_b_sum(cur, vids, trials).items():
            est[(v_, h)] = 2 ** (b / trials) / FM_PHI
    want = {
        v_: sum(
            (est[(v_, h)] - est[(v_, h - 1)]) / h for h in range(1, hops + 1)
        )
        for v_ in vids
    }
    assert set(got) == set(want)
    for v_ in vids:
        assert math.isclose(got[v_], want[v_], rel_tol=1e-9), v_


def test_harmonic_star_center_highest(spark):
    """On a symmetric star the hub is closest to everyone — its harmonic
    estimate must rank first."""
    from comm_detect_spark.operators.anf import harmonic_centrality

    n = 12
    src = [0] * (n - 1) + list(range(1, n))
    dst = list(range(1, n)) + [0] * (n - 1)
    e = edges_df(spark, n, src, dst, [1] * len(src))
    v = spark.range(n).select(F.col("id").alias("vid"))
    got = {
        r["vid"]: r["harmonic"]
        for r in harmonic_centrality(spark, e, v, max_hops=2, trials=32).collect()
    }
    assert max(got, key=got.get) == 0


def test_windowed_distinct_exact_vs_python(spark):
    """windowed_distinct_b_sums == the pure-Python FM fold per hour."""
    from comm_detect_spark.operators.anf import windowed_distinct_b_sums

    rows = []
    for i in range(200):
        hour = i % 3
        user = i % 37
        rows.append((f"2024-01-01 0{hour}:{i % 60:02d}:00", user, 1.0))
    ev = spark.createDataFrame(
        rows, "ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["hour_epoch"]: r["b_sum"]
        for r in windowed_distinct_b_sums(ev, trials=4).collect()
    }

    import datetime

    def epoch(h):
        return int(
            datetime.datetime(
                2024, 1, 1, h, tzinfo=datetime.timezone.utc
            ).timestamp()
        )

    # python replay (session tz is UTC in tests)
    want = {}
    by_hour = {}
    for ts, user, _ in rows:
        h = int(ts[11:13])
        by_hour.setdefault(h, set()).add(user)
    for h, users in by_hour.items():
        tot = 0
        for t in range(4):
            sk = 0
            for u in users:
                hv = _h60(f"{u}:{t}")
                sk |= hv & -hv
            r = (-1 - sk) & (sk + 1)
            tot += r.bit_length() - 1
        want[epoch(h)] = tot
    assert got == want


def test_windowed_distinct_estimate_sane(spark):
    """2^(b/t)/phi lands within a factor ~3 of the true distinct count
    (FM with 8 trials on ~40 keys)."""
    from comm_detect_spark.operators.anf import (
        FM_PHI,
        windowed_distinct_b_sums,
    )

    rows = [
        (f"2024-01-01 00:{i % 60:02d}:00", i % 40, 1.0) for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = windowed_distinct_b_sums(ev, trials=8).collect()[0]
    est = 2 ** (r["b_sum"] / 8) / FM_PHI
    assert 40 / 3 <= est <= 40 * 3


def test_effective_diameter_df_matches_driver_helper(spark, small_graph):
    """The all-DataFrame effective diameter == the driver-side helper fed
    the same neighborhood function (identical interpolation contract)."""
    from comm_detect_spark.operators.anf import (
        anf_hop_b_sums,
        effective_diameter_df,
    )

    vids, edges, e, v = small_graph
    trials = 16
    profile = anf_hop_b_sums(spark, e, v, hops=4, trials=trials)
    got = effective_diameter_df(profile, trials, q=0.9).collect()[0][
        "eff_diameter"
    ]
    # driver-side replay from the SAME profile rows
    rows = sorted(
        (r["hop"], r["b_sum"]) for r in profile.collect()
    )
    import collections

    nf_map = collections.defaultdict(float)
    for hop, b_sum in rows:
        nf_map[hop] += 2.0 ** (b_sum / trials) / FM_PHI
    nf = sorted(nf_map.items())
    want = effective_diameter(nf, q=0.9)
    assert abs(got - round(want, 6)) < 1e-6
