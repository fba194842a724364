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


def test_q14_broadcasts_part(spark):
    from koalas_spark.queries.analytics3 import q14_promo_revenue

    plan = _plan(q14_promo_revenue(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # shipdate window filter pushed to the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_minhash_verify_broadcasts_pairs_not_corpus(spark):
    """The verify join must broadcast the (tiny) candidate pairs and
    stream the shingle table, never the reverse."""
    from pyspark.sql import functions as F
    from koalas_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_sigs,
        shingle_sets,
        verify_pairs_jaccard,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    base = shingle_sets(docs, "doc_id", "text")
    sigs = minhash_sigs(base, 32)
    pairs = lsh_candidate_pairs(sigs, bands=8, rows=4)
    ver = verify_pairs_jaccard(pairs, base, 0.5)
    plan = _plan(ver)
    # the gather-shaped verify hints shuffle_hash with the (small)
    # exploded-pairs side as build — a forced broadcast would OOM
    # executors at scale, and AQE still upgrades to broadcast at
    # runtime when the pair set is tiny. The shingles column must
    # never land on a hash-build side.
    assert plan.count("ShuffledHashJoin") >= 1
    import re

    for m in re.finditer(r"ShuffledHashJoin .*?(BuildLeft|BuildRight)", plan):
        assert "shingles" not in m.group(0)


def test_ivf_broadcasts_centroids(spark):
    from koalas_spark.queries.analytics2 import ann_ivf_topk

    plan = _plan(ann_ivf_topk(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def _simple(df) -> str:
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")  # noqa: SLF001


def test_funnel_single_user_shuffle(spark):
    """Chained funnel windows + per-user agg must share ONE exchange on
    user_id — the property that keeps the funnel a single pass at 100 TB."""
    from koalas_spark.queries.analytics6 import funnel_conversion

    plan = _simple(funnel_conversion(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1


def test_cdc_compact_window_group_limit(spark):
    """rk=1 must push a partial WindowGroupLimit below the shuffle so
    each map task ships one row per key, not the whole history."""
    from koalas_spark.queries.analytics6 import cdc_upsert_compact

    plan = _simple(cdc_upsert_compact(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit")[2][:200]


def test_grouping_sets_partial_agg(spark):
    """GROUPING SETS must expand map-side with partial aggregation —
    the shuffle carries |sets| x |groups| rows, never the fact table."""
    from koalas_spark.queries.analytics6 import grouping_sets_agg

    plan = _simple(grouping_sets_agg(spark, SF_SMOKE))
    assert "Expand" in plan
    assert "partial_" in plan


def test_session_window_single_shuffle(spark):
    from koalas_spark.queries.analytics6 import session_window_native

    plan = _simple(session_window_native(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1


def test_q21_scans_lineitem_once(spark):
    # the r1 rewrite recovers the lone late supplier from the per-order
    # aggregate instead of joining the detail back — lock in the
    # single-scan plan
    from koalas_spark.queries.analytics5 import q21_waiting_supplier

    plan = _plan(q21_waiting_supplier(spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A filtered dim joined on the fact's partition column must inject
    a dynamicpruning subquery into the fact scan — at 100 TB this is
    the difference between scanning 5 directories and 5000. The dim
    filter is required: DPP only triggers off a selective predicate on
    the build side (here it also reuses the broadcast exchange)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "fact_by_lang")
    docs.write.partitionBy("lang").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("en", "keep"), ("fr", "keep"), ("de", "drop"), ("es", "drop"), ("it", "drop")],
        "lang string, tag string",
    )
    j = fact.join(dim.filter(F.col("tag") == "keep"), "lang").groupBy("tag").count()
    plan = j._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower()
    # and it actually prunes: only the two kept partitions are read
    assert j.collect()[0]["count"] == docs.filter(F.col("lang").isin("en", "fr")).count()


def test_runtime_bloom_filter_fires(spark):
    """A selective filter on one side of a shuffle join must inject a
    runtime bloom filter on the probe side, cutting shuffled rows
    before the exchange. The size thresholds exist because building a
    bloom filter only pays off against a big scan (default 10 GB
    application side) — local test data never qualifies, so the test
    lowers them to prove the wiring; at production scale the defaults
    fire on their own."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        ord_ = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        sel = ord_.filter(F.col("o_totalprice") > 400000)
        j = (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().toString()
        assert "bloom" in plan.lower()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
