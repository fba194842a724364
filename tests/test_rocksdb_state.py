"""RocksDB state store (SURVEY §2.7 scale note): the default
HDFS-backed state store keeps every key in executor heap — at 100 TB
key cardinalities that's the first streaming OOM. Spark ships a
RocksDB provider (spilling, incremental checkpoints) behind one conf;
this test runs the same windowed aggregation under BOTH providers and
asserts identical results, proving the swap is a pure capacity knob,
not a semantics change."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _run_windowed(spark, provider: str | None):
    from koalas_spark.streaming.windows import stream_tumbling_counts

    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    try:
        if provider:
            spark.conf.set(key, provider)
        df = stream_tumbling_counts(
            spark, f"{SF_SMOKE}/events.parquet", "1 hour", "1 hour"
        )
        return {
            tuple(r)[:2]: (r["n"], round(r["sum_value"], 6))
            for r in df.collect()
        }
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def test_rocksdb_state_store_matches_default():
    from koalas_spark import get_spark

    spark = get_spark("koalas_spark_tests", cpus=8)
    default = _run_windowed(spark, None)
    rocks = _run_windowed(spark, ROCKS)
    assert rocks == default
    assert len(rocks) > 0
