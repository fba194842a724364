"""Semantic unit tests for the round-5 operators (analytics8.py):
planted inputs with hand-computed expectations, complementing the
DuckDB oracle equivalence the driver checks."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{path}/events.parquet")


TS = datetime.datetime  # noqa: N816 - terse in fixtures


def test_event_debounce_planted_burst(spark, tmp_path):
    """Three clicks 10s apart = one kept; a fourth 2min later starts a
    new island; a different user keeps independently."""
    from koalas_spark.queries.analytics8 import event_debounce

    rows = [
        (1, TS(2024, 1, 1, 0, 0, 0), 1, "click", 1.0, "{}"),
        (2, TS(2024, 1, 1, 0, 0, 10), 1, "click", 1.0, "{}"),
        (3, TS(2024, 1, 1, 0, 0, 20), 1, "click", 1.0, "{}"),
        (4, TS(2024, 1, 1, 0, 2, 30), 1, "click", 1.0, "{}"),
        (5, TS(2024, 1, 1, 0, 0, 5), 2, "click", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {r.event_type: (r.n_raw, r.n_kept) for r in event_debounce(spark, str(tmp_path)).collect()}
    assert got == {"click": (5, 3)}


def test_concurrent_sessions_peak_planted_overlap(spark, tmp_path):
    """Three 30-min sessions starting 0/10/20 min in overlap at minute
    20-29 => peak concurrency 3, earliest peak minute = start+20min."""
    from koalas_spark.queries.analytics8 import concurrent_sessions_peak

    rows = [
        (1, TS(2024, 1, 1, 0, 0, 30), 1, "view", 1.0, "{}"),
        (2, TS(2024, 1, 1, 0, 10, 30), 2, "view", 1.0, "{}"),
        (3, TS(2024, 1, 1, 0, 20, 30), 3, "view", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    [r] = concurrent_sessions_peak(spark, str(tmp_path)).collect()
    assert r.peak_concurrency == 3
    assert r.peak_minute == TS(2024, 1, 1, 0, 20)


def test_rfm_segments_partition_customers(spark):
    """Every customer lands in exactly one of the 8 segments and the
    segment populations sum to the customer count."""
    from koalas_spark.queries.analytics8 import rfm_segmentation

    rows = rfm_segmentation(spark, SF_SMOKE).collect()
    segs = {r.segment for r in rows}
    assert segs <= {"RFM", "RFm", "RfM", "Rfm", "rFM", "rFm", "rfM", "rfm"}
    n_cust = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust


def test_incremental_agg_merge_is_idempotent_and_complete(spark):
    """Two runs produce identical results (cached state) and the merge
    equals the direct full aggregate."""
    from koalas_spark.queries.analytics8 import incremental_agg_merge

    a = {(r.day, r.event_type): (r.n, r.sum_value) for r in incremental_agg_merge(spark, SF_SMOKE).collect()}
    b = {(r.day, r.event_type): (r.n, r.sum_value) for r in incremental_agg_merge(spark, SF_SMOKE).collect()}
    assert a == b
    from koalas_spark.queries.analytics import _t

    full = {
        (r.day, r.event_type): r.n
        for r in _t(spark, SF_SMOKE, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    assert {k: v[0] for k, v in a.items()} == full


def test_partition_overwrite_backfill_replay_stable(spark):
    """Replaying the backfill (same cached table) returns identical
    audit numbers — the dynamic overwrite is idempotent."""
    from koalas_spark.queries.analytics8 import partition_overwrite_backfill

    r1 = partition_overwrite_backfill(spark, SF_SMOKE).collect()[0]
    r2 = partition_overwrite_backfill(spark, SF_SMOKE).collect()[0]
    assert r1 == r2
    assert r1.n_rows == r1.n_days * 5  # 5 event types per day in testdata


def test_scd2_point_in_time_expiry(spark, tmp_path):
    """A purchase 10 min after a view gets state 'view'; a purchase 2h
    after any state event gets 'none'; one before any state is 'none'."""
    from koalas_spark.queries.analytics8 import scd2_point_in_time_join

    rows = [
        (1, TS(2024, 1, 1, 9, 0, 0), 1, "view", 1.0, "{}"),
        (2, TS(2024, 1, 1, 9, 10, 0), 1, "purchase", 5.0, "{}"),
        (3, TS(2024, 1, 1, 12, 0, 0), 1, "purchase", 5.0, "{}"),
        (4, TS(2024, 1, 1, 8, 0, 0), 2, "purchase", 5.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {r.state: r.n_events for r in scd2_point_in_time_join(spark, str(tmp_path)).collect()}
    assert got == {"view": 1, "none": 2}


def test_user_erasure_removes_every_listed_user(spark):
    """No kept row may belong to a deletion-list user, and the audit's
    before-minus-after per type equals the rows those users owned."""
    from koalas_spark.queries.analytics import _t

    ev = _t(spark, SF_SMOKE, "events").select("user_id", "event_type")
    coin = F.substring(F.md5(F.col("user_id").cast("string")), 1, 4)
    listed = ev.filter(coin < "051f")
    owned = {r.event_type: r.n for r in listed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    from koalas_spark.queries.analytics8 import user_erasure_compact

    for r in user_erasure_compact(spark, SF_SMOKE).collect():
        assert r.rows_before - r.rows_after == owned.get(r.event_type, 0)
