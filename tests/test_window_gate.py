"""Unit tests for the unpartitioned-Window justification gate
(VERDICT r10 #8, tools/audit_plans.py::_global_window_audit).

The registry-wide enforcement lives in tests/test_plan_audit.py (any
UnboundedGlobalWindow! flag is unallowlistable there); these tests pin
the DETECTOR's behavior on the four canonical shapes so a parser
regression can't quietly turn the gate off."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tools.audit_plans import (
    _bounded_rdd_scan_ids,
    _global_window_audit,
    _partitionless_window_ids,
)


def _fmt(spark, df):
    jvm = spark._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )


def _li(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


def test_corpus_scale_global_window_is_flagged(spark):
    # the trap: row_number over the whole table through ONE task
    bad = _li(spark).withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    n_gw, n_unbounded = _global_window_audit(_fmt(spark, bad))
    assert n_gw == 1 and n_unbounded == 1


def test_global_window_over_aggregate_is_bounded(spark):
    good = (
        _li(spark)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
        .withColumn("rn", F.row_number().over(Window.orderBy("l_returnflag")))
    )
    n_gw, n_unbounded = _global_window_audit(_fmt(spark, good))
    assert n_gw == 1 and n_unbounded == 0


def test_partitioned_window_is_not_global(spark):
    part = _li(spark).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("l_returnflag").orderBy("l_orderkey")
        ),
    )
    plan = _fmt(spark, part)
    assert _partitionless_window_ids(plan) == set()
    assert _global_window_audit(plan) == (0, 0)


def test_join_with_raw_leg_is_unbounded(spark):
    # aggregate on one leg does NOT bound a window over the join when
    # the other leg is a raw scan
    li = _li(spark)
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    mixed = li.join(agg, "l_orderkey").withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    n_gw, n_unbounded = _global_window_audit(_fmt(spark, mixed))
    assert n_gw == 1 and n_unbounded == 1


def test_daily_artifact_scan_is_a_named_bound(spark):
    # the day-domain daily_revenue artifact (localCheckpoint → Scan
    # ExistingRDD) is the one checkpointed frame the signature
    # allowlist blesses; a window straight over it must pass
    from koalas_spark.queries.analytics import daily_revenue_table

    d = daily_revenue_table(spark, SF_SMOKE)
    w = d.withColumn("prev", F.lag("x").over(Window.orderBy("d")))
    plan = _fmt(spark, w)
    assert _bounded_rdd_scan_ids(plan), "artifact signature not matched"
    n_gw, n_unbounded = _global_window_audit(plan)
    assert n_gw == 1 and n_unbounded == 0
