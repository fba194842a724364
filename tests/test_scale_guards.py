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
def test_triangle_guard_trips_with_artifact_present(spark, monkeypatch):
    from koalas_spark.queries import mining

    # warm the artifact, then shrink the ceiling below its size
    mining.copurchase_pair_table(spark, SF_SMOKE).count()
    assert os.path.isdir(mining._copurchase_artifact_path(SF_SMOKE))
    monkeypatch.setattr(mining, "TRIANGLE_EXACT_MAX_BYTES", 1)
    with pytest.raises(RuntimeError) as ei:
        mining.triangle_count_parts(spark, SF_SMOKE)
    assert "triangle_count_doulion" in str(ei.value)
    assert "pair artifact" in str(ei.value)


def test_triangle_guard_trips_on_cold_artifact(spark, monkeypatch, tmp_path):
    """ADVICE r12 medium: on a FRESH sf_dir (artifact not yet built)
    the guard must still refuse — via the lineitem-size estimate —
    instead of silently building the artifact and running the
    infeasible wedge join."""
    from koalas_spark.queries import mining

    # a tmp sf_dir whose basename differs => distinct artifact path,
    # guaranteed cold even after other tests warmed the sf0.001 one
    sf = tmp_path / "sf_cold"
    sf.mkdir()
    src = os.path.join(SF_SMOKE, "lineitem.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, sf / "lineitem.parquet")
    else:
        shutil.copy(src, sf / "lineitem.parquet")
    assert not os.path.isdir(mining._copurchase_artifact_path(str(sf)))
    monkeypatch.setattr(mining, "TRIANGLE_EXACT_MAX_BYTES", 1)
    with pytest.raises(RuntimeError) as ei:
        mining.triangle_count_parts(spark, str(sf))
    msg = str(ei.value)
    assert "estimated" in msg  # the cold-cache basis, not the artifact
    assert "triangle_count_doulion" in msg
    # and the refusal really was metadata-only: no artifact was built
    assert not os.path.isdir(mining._copurchase_artifact_path(str(sf)))
