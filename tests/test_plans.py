"""Physical-plan assertions — the scale contract, checked in CI:
column pruning reaches the parquet scan, aggregations are hash-based with
map-side partial aggregation, the hot paths stay in whole-stage codegen,
and nothing falls back to cartesian products."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestScanPruning:
    def test_doc_stats_prunes_columns(self, spark):
        # cached relations from other tests defeat scan pruning (Spark
        # substitutes the full InMemoryRelation) — inspect the cold plan
        spark.catalog.clearCache()
        df = entry_mod.queries()["doc_stats"](spark, SF)
        plan = plan_of(df)
        scan = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert scan, plan
        # only doc_id + text may be read; lang/source/n_chars must be pruned
        assert "lang" not in scan[0] and "source" not in scan[0], scan[0]

    def test_graph_query_prunes_lineitem(self, spark):
        df = entry_mod.queries()["graph_volumes"](spark, SF)
        plan = plan_of(df)
        scan = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert scan
        assert "l_extendedprice" not in scan[0] and "l_quantity" not in scan[0]

    def test_filter_pushdown_triangle_edges(self, spark):
        # l_linenumber = 1 must reach the scan as a pushed filter
        from __spark_entry__ import _t_edges

        plan = plan_of(_t_edges(spark, SF))
        assert "PushedFilters" in plan
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert any("l_linenumber" in l for l in pushed), pushed


class TestAggAndJoins:
    def test_lpa_step_is_hash_agg_no_sort(self, spark, jazz_df):
        from comm_detect_spark.graph.core import vertex_range
        from comm_detect_spark.operators.lpa import lpa_step

        state = vertex_range(spark, 198).withColumn("label", F.col("vid"))
        plan = plan_of(lpa_step(jazz_df, state))
        assert "HashAggregate" in plan
        # the argmax is max_by(struct), not a window sort
        assert "Window" not in plan

    def test_no_cartesian_products_anywhere(self, spark):
        qs = entry_mod.queries()
        for name in ["lpa_round1", "cc_round1", "triangle_total", "coarsen_mod10"]:
            plan = plan_of(qs[name](spark, SF))
            assert "CartesianProduct" not in plan, name

    def test_whole_stage_codegen_in_volume_agg(self, spark):
        # AQE reports 0 codegen subtrees until stages finalize — disable it
        # for this one static-plan inspection
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            df = entry_mod.queries()["graph_volumes"](spark, SF)
            codegen = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "codegen"
            )
            assert "WholeStageCodegen subtrees" in codegen
            assert not codegen.startswith("Found 0 WholeStageCodegen")
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    def test_pagerank_iteration_no_python_udf_in_sql_mode(self, spark, jazz_df):
        from comm_detect_spark.graph.core import out_weights
        from pyspark.sql import functions as F2

        wout = out_weights(jazz_df)
        prep = jazz_df.join(wout, "src").select(
            "src", "dst", (F2.col("weight") / F2.col("wout")).alias("frac")
        )
        plan = plan_of(prep)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
