"""Custom stateful streaming operator: per-user sessionization with
applyInPandasWithState (SURVEY.md §2.7).

Each user's state carries the open session (start, last ts, count);
an event past the gap closes the session and emits it. State is
bounded by an EVENT-TIME timeout: when the watermark passes
last_event + gap, the open session is flushed and the key's state
removed. Event-time (not processing-time) timeouts matter twice over:
they are deterministic under replay, and they let the query go idle
when the source is drained — a processing-time timeout keeps the
stream running empty "cleaning up state" micro-batches forever.
This is the canonical shape for "custom operator Spark lacks" on
streams — grouped state, Arrow-batched.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
STATE_SCHEMA = "start long, last long, n long"

GAP_SECONDS = 30 * 60


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_list.sort()

    start, last, n = state.get if state.exists else (None, None, 0)
    done: list[tuple[int, int, int]] = []
    for t in ts_list:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > GAP_SECONDS * 1_000_000:
            done.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    if start is not None:
        state.update((start, last, n))
        # flush the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(last // 1000 + GAP_SECONDS * 1000)
    if done:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(done),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in done],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in done],
                "n_events": [c for _, _, c in done],
            }
        )


def stream_sessionize(spark: SparkSession, events_path: str) -> DataFrame:
    """Drive the bounded events file through the stateful sessionizer;
    returns closed sessions (open ones remain in state — same
    semantics a production stream would have)."""
    # shared staging: stable key + flat part-file symlinks (directory
    # sources — e.g. scaled tables — stream 0 rows otherwise)
    from koalas_spark.streaming.windows import _staged_events_stream

    src = _staged_events_stream(spark, events_path, "sess")
    sessions = (
        src.select("user_id", "ts")
        .withWatermark("ts", f"{GAP_SECONDS} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    qname = f"sessions_{uuid.uuid4().hex[:8]}"
    # state partitions sized to state volume, not cores — see
    # windows._run_to_memory for the measurement
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
            result = spark.table(qname).persist()
            # materialize the cache before stopping the query (the
            # memory sink's rows are tied to it) — no driver collect()
            result.count()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return result
