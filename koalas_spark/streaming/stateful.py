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


_SENTINEL_USER = -1


def stream_sessionize(spark: SparkSession, events_path: str) -> DataFrame:
    """Drive the bounded events file through the stateful sessionizer
    and FLUSH the tail, so the emitted rows are exactly the batch
    sessionization (value-checked by a shared SQL oracle since r7;
    previously the trailing open session per user stayed in state and
    the op was rows-only).

    Tail flush: after the source drains, two far-future sentinel
    events (user −1) are staged into the monitored dir. Sentinel 1
    advances the event-time watermark past every open session's
    last + gap; sentinel 2 forces the follow-up micro-batch in which
    those event-time timeouts actually fire (timeouts compare against
    the PREVIOUS batch's watermark, so one sentinel alone isn't
    enough). That is exactly how a production stream's tail closes —
    by later traffic moving the watermark — just compressed to the end
    of the bounded replay. The stage dir is therefore per-run (the
    sentinels must not leak into a later run's batch 1, where they'd
    advance the watermark before any timeout could be registered) and
    is removed on exit."""
    import shutil

    from pyspark.sql import functions as F

    from koalas_spark.streaming.windows import _staged_events_stream

    run = uuid.uuid4().hex[:8]
    src, stage = _staged_events_stream(
        spark, events_path, f"sess_{run}", with_stage_dir=True
    )
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

    batch_src = spark.read.parquet(events_path)
    ts_dtype = dict(batch_src.dtypes)["ts"]

    def _stage_sentinel(n: int, gaps_ahead: int) -> None:
        # one-row parquet derived from the source file itself so the
        # column types (incl. the ts flavor) match the staged schema;
        # ts must clear max(ts) + 2*gap for EVERY user, so shift the max
        mx = batch_src.agg(F.max("ts")).first()[0]
        if mx is None:
            # empty source: nothing in state, no tail to flush — and
            # limit(1) below would have no row to derive a sentinel from
            return
        if ts_dtype == "bigint":  # nanos-as-long flavor
            new_ts = F.lit(int(mx) + gaps_ahead * GAP_SECONDS * 1_000_000_000)
        else:
            new_ts = (
                F.lit(mx).cast(ts_dtype)
                + F.expr(f"INTERVAL {gaps_ahead * GAP_SECONDS} SECONDS")
            ).cast(ts_dtype)
        one = (
            batch_src.limit(1)
            .withColumn("user_id", F.lit(_SENTINEL_USER).cast("long"))
            .withColumn("ts", new_ts)
        )
        tmp = os.path.join(stage, f"_sentinel_build_{n}")
        one.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob

        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(stage, f"zz_sentinel_{n}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    qname = f"sessions_{run}"
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
            _stage_sentinel(1, gaps_ahead=3)
            q.processAllAvailable()
            _stage_sentinel(2, gaps_ahead=10)
            q.processAllAvailable()
            result = (
                spark.table(qname)
                .filter(F.col("user_id") != _SENTINEL_USER)
                .persist()
            )
            # materialize the cache before stopping the query (the
            # memory sink's rows are tied to it) — no driver collect()
            result.count()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        shutil.rmtree(stage, ignore_errors=True)
    return result


LOCF_OUT_SCHEMA = "event_type string, was_masked boolean, v_filled double"
LOCF_STATE_SCHEMA = "last_ts long, last_v double"


def _locf_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Carry each user's last observation across micro-batches: rows
    arrive (ts, event_id, event_type, v[, null]) — sort within the
    batch, fill nulls from the running last value, persist the final
    observation as the key's state. State is ONE (ts, value) pair per
    user — the classic streaming enrichment-state shape, bounded by
    key cardinality, not stream length."""
    rows = [pdf for pdf in pdfs]
    pdf = pd.concat(rows).sort_values(["ts", "event_id"])
    last_v = state.get[1] if state.exists else None
    filled = []
    for v in pdf["v"]:
        if pd.notna(v):
            last_v = float(v)
            filled.append(last_v)
        else:
            filled.append(last_v)  # None while no observation yet
    if last_v is not None:
        last_ts = int(pd.to_datetime(pdf["ts"].iloc[-1]).value // 1000)
        state.update((last_ts, last_v))
    yield pd.DataFrame(
        {
            "event_type": pdf["event_type"].to_numpy(),
            "was_masked": pd.isna(pdf["v"]).to_numpy(),
            "v_filled": pd.array(filled, dtype="Float64"),
        }
    )


def stream_locf(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming last-observation-carried-forward: the same planted
    (md5-coin) missingness as the batch locf_impute query, repaired by
    a custom stateful operator instead of a window — per-user state
    carries the last observation across micro-batches, rows fill
    in-batch in event order. With time-ordered ingestion (the bounded
    replay here arrives as one ordered batch) the result is EXACTLY
    the batch window's, so this stateful op shares the batch oracle —
    the strongest check a custom streaming operator can get. The
    emitted per-row frame aggregates batch-side into the audit."""
    from pyspark.sql import functions as F

    from koalas_spark.streaming.windows import _staged_events_stream

    src = _staged_events_stream(spark, events_path, "locf")
    coin = F.substring(F.md5(F.col("event_id").cast("string")), 1, 4)
    masked = src.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(coin < "2667", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    filled = masked.groupBy("user_id").applyInPandasWithState(
        _locf_group,
        outputStructType=LOCF_OUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    qname = f"locf_{uuid.uuid4().hex[:8]}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            filled.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.table(qname).persist()
            rows.count()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return rows.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("was_masked"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_masked"),
        F.sum(
            F.when(F.col("was_masked") & F.col("v_filled").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_filled"),
        F.sum(F.col("v_filled").cast("decimal(25,6)"))
        .cast("string")
        .cast("double")
        .alias("sum_filled"),
    )
