"""Seeded (TrustRank-style) label propagation — Python replay parity,
frozen seeds, unreached-stays-NULL, tie-breaking."""

import hashlib

from pyspark.sql import functions as F

from comm_detect_spark.operators.lpa import seeded_lpa
from tests.conftest import edges_df


def _py_seeded(edges, seeds, rounds):
    verts = set()
    for s, d, _ in edges:
        verts.update((s, d))
    lab = {v: seeds.get(v) for v in verts}
    for _ in range(rounds):
        w = {}
        for s, d, wt in edges:
            if lab[s] is not None:
                key = (d, lab[s])
                w[key] = w.get(key, 0) + wt
        new = dict(lab)
        by_dst = {}
        for (d, c), s_ in w.items():
            by_dst.setdefault(d, []).append((s_, c))
        for d, cands in by_dst.items():
            if d in seeds:
                continue
            # max weight, tie -> lowest label
            cands.sort(key=lambda t: (-t[0], t[1]))
            new[d] = cands[0][1]
        lab = new
    return lab


def _spark_seeded(spark, edges, seeds, rounds):
    n = max(max(s, d) for s, d, _ in edges) + 1
    e = edges_df(
        spark, n, [a for a, _, _ in edges], [b for _, b, _ in edges],
        [w for _, _, w in edges],
    )
    sd = spark.createDataFrame(
        [(v, l) for v, l in seeds.items()], "vid long, label long"
    )
    return {
        r["vid"]: r["label"]
        for r in seeded_lpa(spark, e, sd, rounds=rounds).collect()
    }


class TestSeededLPA:
    def test_chain_spread_and_null_tail(self, spark):
        # 0 -> 1 -> 2 -> 3; seed only vertex 0. After 2 rounds label
        # reaches 2; vertex 3 still NULL.
        edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1)]
        got = _spark_seeded(spark, edges, {0: 7}, rounds=2)
        assert got == {0: 7, 1: 7, 2: 7, 3: None}

    def test_seed_frozen_against_majority(self, spark):
        # two heavy edges push label 5 at seed 0 — it must keep 9
        edges = [(1, 0, 10), (2, 0, 10), (0, 3, 1)]
        got = _spark_seeded(spark, edges, {0: 9, 1: 5, 2: 5}, rounds=2)
        assert got[0] == 9 and got[3] == 9

    def test_tie_breaks_to_lowest_label(self, spark):
        edges = [(0, 2, 3), (1, 2, 3)]
        got = _spark_seeded(spark, edges, {0: 8, 1: 4}, rounds=1)
        assert got[2] == 4

    def test_matches_python_replay(self, spark):
        edges = []
        for v in range(30):
            for j in range(3):
                d = int(
                    hashlib.md5(f"sl:{v}:{j}".encode()).hexdigest()[:8], 16
                ) % 30
                if d != v:
                    edges.append((v, d, 1 + (v + j) % 3))
        edges = sorted(set(edges))
        seeds = {v: v % 4 for v in range(30) if v % 7 == 0}
        for rounds in (1, 3):
            assert _spark_seeded(spark, edges, seeds, rounds) == _py_seeded(
                edges, seeds, rounds
            )
