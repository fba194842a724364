"""Streaming operators: results must agree with their batch twins.

- stream_tumbling_agg is oracle-checked in test_oracle_smoke (shares
  the batch window-agg oracle).
- stream_stateful_sessions (applyInPandasWithState) has no SQL twin;
  here we assert every session it emits is exactly a session the
  batch sessionizer produces (the stream may hold back trailing open
  sessions whose event-time timeout the final watermark never passes).
"""

from tests.conftest import SF_SMOKE


def test_stateful_sessions_subset_of_batch(spark):
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
    assert len(streamed) > 0
    assert len(streamed) == len(set(streamed))  # no duplicate emissions
    missing = [s for s in streamed if s not in batch]
    assert missing == [], f"streamed sessions not in batch output: {missing[:5]}"
    # the stream should emit the large majority of sessions; only the
    # per-user trailing ones may be retained in state
    assert len(streamed) >= 0.5 * len(batch)
