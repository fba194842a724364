"""Bucketed co-located join: both sides bucketed+sorted on the join
key -> SortMergeJoin with NO Exchange (and no extra Sort) on either
side. This is the plan-shape contract that makes repeated fact-fact
joins shuffle-free at scale."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bucketed_join_no_exchange(spark):
    from koalas_spark.operators.bucketing import bucketed_pair

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, o = bucketed_pair(
            spark, SF_SMOKE, ("lineitem", "l_orderkey"), ("orders", "o_orderkey"), buckets=8
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert plan.count("Bucketed: true") == 2
        # values match the plain join
        li_raw = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        o_raw = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        expected = li_raw.join(o_raw, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
