"""Streaming query (§2.7): same tumbling-window semantics as the batch
query #34, executed by the Structured Streaming engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _dsum_sql
from koalas_spark.streaming import stream_tumbling_counts


# 50. streaming tumbling-window agg — oracle shared with the batch
# formulation (window.start == date_trunc('hour', ts) for 1h windows).
@query(
    "stream_tumbling_agg",
    oracle=f"""
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       COUNT(*) AS n, {_dsum_sql('value')} AS sum_value
FROM events GROUP BY 1, 2
""",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_tumbling_counts(spark, f"{sf_dir}/events.parquet", "1 hour", "1 hour")


# 51. custom stateful streaming operator — per-user sessionization via
# applyInPandasWithState (rows-only: emits closed sessions; the
# trailing open session per user stays in state, so the driver's
# SQL-equality check doesn't apply — tests assert the emitted rows are
# a prefix of the batch sessionization).
@query("stream_stateful_sessions", oracle=None)
def stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.streaming.stateful import stream_sessionize

    return stream_sessionize(spark, f"{sf_dir}/events.parquet")
