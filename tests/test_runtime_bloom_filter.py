"""Catalyst runtime Bloom-filter injection (InjectRuntimeFilter) —
the optimizer-native cousin of the hand-built Bloom prefilter that
measured NEGATIVE for the wedge family (SCALING.md r11): when one
side of a shuffle join carries a selective filter, Spark builds a
Bloom filter from that side's join keys and pushes a
bloom_filter_might_contain probe into the OTHER side's scan — rows
that cannot match die before the shuffle. At 100 TB this is the free
lever for selective fact-fact joins (the default
applicationSideScanSizeThreshold of 10 GB engages it exactly there);
this test lowers the threshold so the same plan shape is assertable
at test scale, and pins BOTH directions:

  * knob on  -> bloom_filter_agg build + might_contain probe in-plan,
    and the join result is VALUE-IDENTICAL to the unfiltered plan
    (the filter is a pure pre-shuffle row killer);
  * knob off -> no Bloom nodes (the assertion can't pass vacuously).
"""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _fmt(spark, df):
    jvm = spark._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )


def _join(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


def test_runtime_bloom_filter_fires_and_is_value_invariant(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force a shuffle join (broadcast would bypass the injector)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        on_df = _join(spark)
        on_plan = _fmt(spark, on_df)
        assert "bloom_filter_agg" in on_plan, "build side missing"
        assert "might_contain" in on_plan.lower(), "probe side missing"
        on_row = on_df.collect()[0]

        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        off_df = _join(spark)
        off_plan = _fmt(spark, off_df)
        assert "bloom_filter_agg" not in off_plan
        off_row = off_df.collect()[0]

        # the filter only kills rows that cannot match: values identical
        assert on_row["n"] == off_row["n"]
        assert on_row["cents"] == off_row["cents"]
        assert on_row["n"] > 0  # non-vacuous join
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
