"""Scale-guard contracts (round 13): the two quadratic-output ops
refuse FAST — metadata-only / tiny-aggregation checks that fire
BEFORE any infeasible stage launches — with actionable messages
naming the at-scale alternative, and stay silent at feasible SFs.
"""

import os
import shutil

import pytest

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- fuzzy
def test_fuzzy_guard_trips_on_tiny_ceiling(spark, monkeypatch):
    from koalas_spark.queries import analytics9

    monkeypatch.setattr(analytics9, "FUZZY_WORKLOAD_MAX", 10)
    with pytest.raises(RuntimeError) as ei:
        analytics9.fuzzy_match_parts(spark, SF_SMOKE)
    msg = str(ei.value)
    assert "fuzzy_match_topk" in msg  # names the bounded alternative
    assert "SPARK_GRAFT_FUZZY_WORKLOAD_MAX" in msg  # names the override


def test_fuzzy_guard_silent_at_smoke_sf(spark):
    from koalas_spark.queries import analytics9

    # default ceiling: constructs (and the top-k contract is never
    # guarded — bounded output by construction)
    assert analytics9.fuzzy_match_parts(spark, SF_SMOKE).count() > 0
    assert analytics9.fuzzy_match_topk(spark, SF_SMOKE).count() > 0


def test_fuzzy_topk_bounded_per_key(spark):
    from pyspark.sql import functions as F

    from koalas_spark.queries import analytics9

    df = analytics9.fuzzy_match_topk(spark, SF_SMOKE)
    mx = df.groupBy("key_a").count().agg(F.max("count")).first()[0]
    assert mx <= 3


# ------------------------------------------------------------- triangle
def test_triangle_guard_trips_on_tiny_ceiling(spark, monkeypatch, tmp_path):
    """The guard must refuse via the metadata-only lineitem-size
    estimate BEFORE any job (or pair-table build) runs — r13: the
    estimate is the ONLY basis now that the cross-process pair
    snapshot is gone (session-scoped sharing cannot be inspected
    from a cold process anyway)."""
    from koalas_spark.queries import mining

    # a tmp sf_dir copy so the session pair memo for SF_SMOKE (warmed
    # by other tests) cannot mask a build triggered by the guard
    sf = tmp_path / "sf_cold"
    sf.mkdir()
    src = os.path.join(SF_SMOKE, "lineitem.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, sf / "lineitem.parquet")
    else:
        shutil.copy(src, sf / "lineitem.parquet")
    monkeypatch.setattr(mining, "TRIANGLE_EXACT_MAX_BYTES", 1)
    with pytest.raises(RuntimeError) as ei:
        mining.triangle_count_parts(spark, str(sf))
    msg = str(ei.value)
    assert "estimated" in msg  # the metadata-only basis
    assert "triangle_count_doulion" in msg
    assert "SPARK_GRAFT_TRIANGLE_EXACT_MAX" in msg  # names the override
