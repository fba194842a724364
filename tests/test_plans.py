"""Physical-plan quality gates — the properties that matter at 100 TB.

These assert on explain() output: filters reach the parquet scan,
projections prune the read schema, dimension joins broadcast, and hot
paths stay inside whole-stage codegen.
"""

import pytest

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # noqa: SLF001


def test_q6_pushdown_and_pruning(spark):
    from koalas_spark.queries.analytics import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    # only the 4 referenced columns are read
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    assert "l_partkey" not in read and "l_returnflag" not in read


def test_q5_broadcasts_dims(spark):
    from koalas_spark.queries.analytics import q5_local_supplier

    plan = _plan(q5_local_supplier(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_subset_prunes_scan(spark):
    from koalas_spark.queries.parity import subset_cols

    plan = _plan(subset_cols(spark, SF_SMOKE))
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read and "l_extendedprice" not in read


def test_q1_whole_stage_codegen(spark):
    from koalas_spark.queries.analytics import q1_pricing_summary

    df = q1_pricing_summary(spark, SF_SMOKE)
    df.collect()  # AQE finalizes the plan on execution
    jvm = df.sparkSession._jvm  # noqa: SLF001
    final = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")  # noqa: SLF001
    assert "*(1)" in final  # codegen stage markers
    assert "partial_sum" in final  # map-side partial aggregation


def test_asof_single_shuffle(spark):
    """The as-of join must shuffle each side once (union+window), not
    explode an inequality join."""
    from koalas_spark.queries.analytics import asof_join_events_orders

    plan = _plan(asof_join_events_orders(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
