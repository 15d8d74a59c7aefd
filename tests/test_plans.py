"""Physical-plan audits: the plans we'd want at 100 TB, asserted.

Catalyst must: push filters into the parquet scan, prune columns,
broadcast dimension tables, keep conform casts inside whole-stage
codegen, and keep Python out of everything except the codec UDFs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestPushdownAndPruning:
    def test_filter_pushdown(self, spark):
        from mojap_arrow_pd_parser_spark.queries import q01_pricing_summary

        plan = plan_of(q01_pricing_summary(spark, SF)).replace(" ", "")
        assert "PushedFilters:[IsNotNull(l_quantity),LessThan(l_quantity,30" in plan

    def test_column_pruning(self, spark):
        from mojap_arrow_pd_parser_spark.queries import q01_pricing_summary

        plan = plan_of(q01_pricing_summary(spark, SF))
        # 11-column table, only 5 read
        scan_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
        assert "l_returnflag" in scan_schema and "l_quantity" in scan_schema
        assert "l_partkey" not in scan_schema and "l_shipdate" not in scan_schema

    def test_decode_column_pruning(self, spark, tmp_path):
        from mojap_arrow_pd_parser_spark.datagen import tokens_table
        from mojap_arrow_pd_parser_spark.operators.decode import decode_table
        from mojap_arrow_pd_parser_spark.operators.encode import encode_table

        out = str(tmp_path / "enc")
        encode_table(spark, tokens_table(spark, 300, seed=1), out, n_chunks=2)
        plan = plan_of(decode_table(spark, out, columns=["doc_id", "n_tok"])).replace(" ", "")
        # payload rows for other columns filtered at the scan
        assert "In(column," in plan and "PushedFilters" in plan


class TestJoinStrategies:
    def test_dims_broadcast(self, spark):
        from mojap_arrow_pd_parser_spark.queries import q03_nation_revenue

        plan = plan_of(q03_nation_revenue(spark, SF))
        assert plan.count("BroadcastHashJoin") >= 3
        assert "CartesianProduct" not in plan

    def test_whole_stage_codegen_conform(self, spark):
        """The conform layer must stay inside codegen (no Python eval)."""
        from mojap_arrow_pd_parser_spark.queries import q08_conform_cast

        df = q08_conform_cast(spark, SF)
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # codegen'd spans show as "*(n)" markers in the executed plan tree
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "*(1)" in executed

    def test_bucket_assign_is_jvm_side(self, spark, tmp_path):
        from mojap_arrow_pd_parser_spark.datagen import tokens_table
        from mojap_arrow_pd_parser_spark.plans.chunking import assign_buckets, make_plan

        df = tokens_table(spark, 500, seed=2)
        plan_d = make_plan(df, "doc_id", 8)
        plan = plan_of(assign_buckets(df, plan_d).select("_bucket"))
        # the fold is an expression, not a Python UDF stage
        assert "BatchEvalPython" not in plan
        assert plan.count("ArrowEvalPython") == 0


class TestShuffleShape:
    def test_encode_has_single_shuffle(self, spark, tmp_path):
        """Encode plan: scan -> bucket fold -> ONE exchange -> mapInArrow."""
        from mojap_arrow_pd_parser_spark.datagen import tokens_table
        from mojap_arrow_pd_parser_spark.plans.chunking import assign_buckets, make_plan

        df = tokens_table(spark, 500, seed=3)
        p = make_plan(df, "doc_id", 8)
        import re

        enc_input = assign_buckets(df, p).repartition(8, "_bucket")
        plan = plan_of(enc_input)
        # one Exchange node (appears once in the tree and once as a
        # numbered detail section)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

    def test_salted_agg_two_stage(self, spark):
        from mojap_arrow_pd_parser_spark.queries import q19_salted_agg

        plan = plan_of(q19_salted_agg(spark, SF))
        # partial aggregate on (key, salt) then final on key
        assert plan.count("HashAggregate") >= 4
