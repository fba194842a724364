from koalas_spark.streaming.windows import stream_tumbling_counts

__all__ = ["stream_tumbling_counts"]
