"""Runtime bloom-filter join pruning (SURVEY.md §4): Spark injects a
bloom might_contain predicate on the fact side of a shuffle join when
the dim side carries a selective filter — a semi-join reduction that
skips shuffling fact rows that cannot match. Off by default locally
only because the application-side threshold (10 GB scanned) targets
cluster-scale inputs; this test lowers the thresholds to prove the
join shape qualifies, which is exactly the 100 TB configuration."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bloom_filter_injected_on_fact_dim_join(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
        orders = spark.read.parquet(
            os.path.join(SF_SMOKE, "orders.parquet")
        ).filter(F.col("o_orderpriority") == "1-URGENT")
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "might_contain" in plan, "bloom runtime filter not injected"
        # the reduction must land on the FACT scan side, pre-shuffle
        before_join = plan.split("SortMergeJoin")[-1]
        assert "might_contain" in before_join
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
