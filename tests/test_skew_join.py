"""AQE skew-join splitting (SURVEY.md §4, VERDICT r9 item 6): when a
sort-merge join's shuffle has one oversized partition, AQE's
OptimizeSkewedJoin rule cuts it into advisory-sized slices at runtime
(SortMergeJoin(skew=true) in the final adaptive plan). The production
thresholds (256 MB / factor 5) target cluster-scale shuffles, so these
tests lower them to prove the join SHAPES qualify — synthetic hot-key
data first, then the registered `skew_hot_key_join_stats` query's
exact plan — which is precisely the 100 TB configuration where the
defaults engage without any tuning."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        spark.conf.set(k, v)


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only after execution
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def test_optimize_skewed_join_fires_on_hot_key():
    # fresh-session conftest spark fixture not used: the skew split is
    # sensitive to shuffle sizes, so pin a known-size synthetic input
    from koalas_spark import get_spark

    spark = get_spark("koalas_spark_tests", cpus=8)
    saved = _with_confs(spark, SKEW_CONFS)
    try:
        # 2/3 of 400k rows collapse onto key 0 -> one ~3 MB partition
        # vs a ~100 B median: over both the factor and byte thresholds
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 3 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        right = spark.range(0, 400_000).select(
            F.col("id").alias("k"), F.lit(1).alias("one")
        )
        j = (
            left.join(right.hint("merge"), "k")
            .groupBy()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        plan = _final_plan(j)
        assert "skew=true" in plan, "OptimizeSkewedJoin did not fire"
    finally:
        _restore(spark, saved)


def test_registered_skew_query_plan_splits(tmp_path):
    """The registered query's own code path must skew-split. The
    driver ships single-row-group parquet, so the hot reduce partition
    arrives from ONE map task — AQE detects the skew (23x over median)
    but createSkewPartitionSpecs cannot split a single map chunk. A
    production table has many files/row groups; rebuild sf0.001 with
    that shape (8 files per table) and assert the split fires on the
    exact registered query."""
    from koalas_spark import get_spark
    from koalas_spark.queries import all_queries

    spark = get_spark("koalas_spark_tests", cpus=8)
    skew_sf = str(tmp_path / "skew_sf")
    for tbl in ("lineitem", "orders"):
        spark.read.parquet(f"{SF_SMOKE}/{tbl}.parquet").repartition(
            8
        ).write.mode("overwrite").parquet(f"{skew_sf}/{tbl}.parquet")
    confs = dict(
        SKEW_CONFS,
        **{
            # sf0.001's hot partition is ~200 KB of fingerprinted rows
            # vs a ~10 KB median; these bounds sit between the two
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        },
    )
    saved = _with_confs(spark, confs)
    try:
        q = all_queries()["skew_hot_key_join_stats"]
        plan = _final_plan(q(spark, skew_sf))
        assert "SortMergeJoin" in plan, "merge hint did not pin SMJ"
        if "skew=true" not in plan:
            pytest.fail(
                "skew split did not fire on the registered query plan:\n"
                + "\n".join(
                    line
                    for line in plan.splitlines()
                    if "SortMergeJoin" in line or "Exchange" in line
                )
            )
    finally:
        _restore(spark, saved)
