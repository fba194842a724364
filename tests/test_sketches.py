"""Sketch-family queries: mergeable HLL rollup and approx heavy
hitters (SURVEY.md §2.2 #123-124). The queries' checked surfaces are
exact values + error-bound flags (oracle-checked); these tests pin the
flag semantics and the small-vocab exactness independently."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_hll_rollup_error_bounded(spark):
    from koalas_spark.queries.analytics6 import hll_user_rollup

    rows = hll_user_rollup(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        # lgK=14 gives ~0.8% standard error; the query's 5% flag must
        # therefore always hold
        assert r.approx_within_5pct, (r.event_type, r.exact_users)


def test_approx_topk_matches_exact_on_small_vocab(spark):
    from koalas_spark.functions.textfn import tokens
    from koalas_spark.queries.analytics6 import approx_token_topk

    got = [(r.token, r.approx_count) for r in approx_token_topk(spark, SF_SMOKE).collect()]
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exact = (
        d.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.col("count").desc(), F.col("t"))
        .limit(50)
        .collect()
    )
    # vocabulary << sketch map size, so counts are exact
    assert got == [(r.t, r["count"]) for r in exact]
