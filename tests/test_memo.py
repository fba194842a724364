"""The session-artifact memo registry (koalas_spark.memo).

bench.py resets every registered memo around each timed sample so no
sample ever reads another sample's shared build (VERDICT r13 lead
item). These tests pin the contract: all memo dicts are registered,
reset empties them, and a post-reset rebuild returns identical rows.
"""

import sys

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_SMOKE


def _all_memo_dicts():
    # importing the query modules populates the registry
    import koalas_spark.queries.analytics  # noqa: F401
    import koalas_spark.queries.dedup  # noqa: F401
    import koalas_spark.queries.mining  # noqa: F401
    import koalas_spark.queries.retrieval  # noqa: F401
    import koalas_spark.queries.similarity  # noqa: F401
    from koalas_spark.memo import _REGISTRY

    return _REGISTRY


def test_every_session_memo_is_registered():
    """Each known module-level memo dict must be the same object as a
    registry entry — a new memo added without register_memo would make
    bench samples reuse its artifact across samples."""
    from koalas_spark.queries import analytics, dedup, mining, retrieval, similarity

    registry = _all_memo_dicts()
    ids = {id(d) for d in registry}
    for d in (
        analytics._SPREAD_CACHE,
        analytics._DAILY_CACHE,
        mining._PAIR_CACHE,
        mining._DEG_CACHE,
        retrieval._BM25_CACHE,
        retrieval._UNI_CACHE,
        similarity._KM_CACHE,
        similarity._NN_GRAPH_CACHE,
        dedup._MH_CACHE,
    ):
        assert id(d) in ids
    assert len(registry) == 9


def test_reset_forces_rebuild_with_identical_rows(spark):
    from koalas_spark.memo import reset_session_artifacts
    from koalas_spark.queries.analytics import _DAILY_CACHE, daily_revenue_table

    reset_session_artifacts()
    first = daily_revenue_table(spark, SF_SMOKE)
    assert len(_DAILY_CACHE) == 1
    rows_first = sorted((r["d"], r["x"]) for r in first.collect())

    reset_session_artifacts()
    assert all(not d for d in _all_memo_dicts())

    second = daily_revenue_table(spark, SF_SMOKE)
    assert len(_DAILY_CACHE) == 1
    rows_second = sorted((r["d"], r["x"]) for r in second.collect())
    assert rows_first == rows_second
    reset_session_artifacts()
