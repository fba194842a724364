"""Streaming operators: results must agree with their batch twins.

- stream_tumbling_agg is oracle-checked in test_oracle_smoke (shares
  the batch window-agg oracle).
- stream_stateful_sessions (applyInPandasWithState) flushes its
  open-session tail via sentinel watermark advancement since r7, so
  its emitted rows must EQUAL the batch sessionization exactly (it is
  also oracle-checked in test_oracle_smoke; the equality here pins the
  batch-twin agreement independent of the SQL formulation).
"""

from tests.conftest import SF_SMOKE


def test_stateful_sessions_equal_batch(spark):
    from koalas_spark.queries.analytics import sessionize_events
    from koalas_spark.streaming.stateful import stream_sessionize

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_events(spark, SF_SMOKE).collect()
    }
    streamed = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in stream_sessionize(spark, f"{SF_SMOKE}/events.parquet").collect()
    ]
    assert len(streamed) == len(set(streamed))  # no duplicate emissions
    assert set(streamed) == batch


def test_foreachbatch_sink_replay_idempotent(spark, tmp_path):
    """The exactly-once claim: re-running the stream over the same
    source (checkpoint wiped, as after a catastrophic recovery) must
    OVERWRITE each batch directory, not append duplicates — the lake
    aggregates identically both times."""
    import shutil

    from pyspark.sql import functions as F

    from koalas_spark.streaming.windows import stream_foreachbatch_parquet

    out = str(tmp_path / "lake")
    src = f"{SF_SMOKE}/events.parquet"

    def totals():
        df = stream_foreachbatch_parquet(spark, src, out)
        row = df.agg(
            F.sum("n").alias("n"),
            F.sum(F.col("sum_value").cast("decimal(25,6)")).cast("double").alias("s"),
        ).collect()[0]
        return (row.n, row.s)

    first = totals()
    # second call short-circuits on the _DONE marker (idempotent rerun)
    assert totals() == first
    # crash-recovery shape: _DONE lost, checkpoint lost, lake still on
    # disk -> the replay must overwrite, not duplicate
    import os

    os.remove(os.path.join(out, "_DONE"))
    shutil.rmtree(out + "_ckpt", ignore_errors=True)
    assert totals() == first


def test_windowed_distinct_users_matches_batch(spark):
    from pyspark.sql import functions as F

    from koalas_spark.queries.analytics import _load_events
    from koalas_spark.streaming.windows import stream_windowed_distinct_users

    got = {
        (r.window_start, r.n_users)
        for r in stream_windowed_distinct_users(
            spark, f"{SF_SMOKE}/events.parquet"
        ).collect()
    }
    want = {
        (r.ws, r.n)
        for r in _load_events(spark, SF_SMOKE)
        .groupBy(F.date_trunc("hour", "ts").alias("ws"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_statestore_reader_exposes_agg_state(spark, tmp_path):
    """Spark 4 state-store data source: the checkpointed state of a
    streaming aggregation is queryable as a table — the production
    debugging path for 'what does my stream think right now' without
    touching the running query. Contents must equal the batch twin."""
    from pyspark.sql import functions as F

    from koalas_spark.queries.analytics import _load_events
    from koalas_spark.streaming.windows import _staged_events_stream

    src = _staged_events_stream(spark, f"{SF_SMOKE}/events.parquet", "ssr")
    ckpt = str(tmp_path / "ckpt")
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ssr_probe")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = {
        (r["key"]["event_type"], r["value"]["count"])
        for r in spark.read.format("statestore").load(ckpt).collect()
    }
    want = {
        (r.event_type, r.n)
        for r in _load_events(spark, SF_SMOKE)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert state == want


def test_stream_sessionize_empty_source(spark, tmp_path):
    """An empty events source must yield an empty result, not crash in
    the sentinel tail-flush (ADVICE r7: agg(max(ts)) returns None)."""
    import pyspark.sql.functions as F

    from koalas_spark.streaming.stateful import stream_sessionize

    empty = str(tmp_path / "empty_events")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(0).write.parquet(
        empty
    )
    out = stream_sessionize(spark, empty)
    assert out.count() == 0
