"""k-hop ego subgraph — reach semantics, induced closure edges, hop-0,
directedness."""

from comm_detect_spark.operators.subgraph import khop_subgraph
from tests.conftest import edges_df

#    0 -> 1 -> 2 -> 3 -> 4 ;  5 -> 0 ; 2 -> 0
EDGES = [(0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 4, 1), (5, 0, 1), (2, 0, 3)]


def _e(spark):
    return edges_df(
        spark, 6,
        [s for s, _, _ in EDGES],
        [d for _, d, _ in EDGES],
        [w for _, _, w in EDGES],
    )


class TestKhopSubgraph:
    def test_two_hop_from_zero(self, spark):
        got = {
            (r["src"], r["dst"]): r["weight"]
            for r in khop_subgraph(spark, _e(spark), [0], k=2).collect()
        }
        # reach = {0, 1, 2}; induced edges among them (5->0 excluded:
        # 5 unreachable OUT of 0; 2->3 excluded: 3 outside)
        assert got == {(0, 1): 1, (1, 2): 2, (2, 0): 3}

    def test_hop_zero_is_seed_internal_only(self, spark):
        got = khop_subgraph(spark, _e(spark), [0, 1], k=0).collect()
        assert {(r["src"], r["dst"]) for r in got} == {(0, 1)}

    def test_direction_matters(self, spark):
        # from 4 nothing is reachable out: the ego graph is empty
        assert khop_subgraph(spark, _e(spark), [4], k=3).count() == 0

    def test_full_reach_returns_everything_reachable(self, spark):
        got = {
            (r["src"], r["dst"])
            for r in khop_subgraph(spark, _e(spark), [5], k=10).collect()
        }
        # 5 reaches everything except nothing; 5->0 in closure
        assert got == {(s, d) for s, d, _ in EDGES}


def test_khop_releases_its_caches(spark, monkeypatch):
    """hop_edges + the seed frame must be unpersisted once the induced
    edge set is materialized. Tracks persist() calls directly (see
    test_mis for why getPersistentRDDs is the wrong probe)."""
    # patch the CONCRETE class: in PySpark 4 the classic DataFrame
    # overrides persist, so patching the pyspark.sql.dataframe base
    # intercepts nothing (a vacuous spy passes any leak)
    import pyspark.sql.classic.dataframe as D

    tracked = []
    orig = D.DataFrame.persist

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        tracked.append(out)
        return out

    monkeypatch.setattr(D.DataFrame, "persist", spy)
    out = khop_subgraph(spark, _e(spark), [0, 1], k=2)
    assert out.count() >= 0
    assert tracked, "spy never fired — wrong class patched"
    still = [df for df in tracked
             if df.storageLevel.useMemory or df.storageLevel.useDisk]
    assert not still, f"{len(still)} frames still persisted"
