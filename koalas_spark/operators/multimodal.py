"""Multimodal column plumbing (SURVEY.md §2.6).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schema, Arrow batching through
mapInPandas, partition sizing — is real and tested; the actual media
decode is STUBBED (decode libs are not in this container) behind
``decode_stub`` which raises NotImplementedError, with a deterministic
fake used by ``extract_meta`` so the pipeline is end-to-end runnable.

At 100 TB: binary payloads ride in the same parquet row groups;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory, and the
mapInPandas iterator processes one Arrow batch at a time so a task
never holds a partition of blobs in memory at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id bigint, n_bytes bigint, kind string"


def with_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text here;
    in production this is the raw media payload read from parquet)."""
    return df.withColumn("blob", F.encode(F.col(text_col), "UTF-8"))


def decode_stub(blob: bytes) -> object:
    """Media decode placeholder. Real deployments plug PIL/ffmpeg here."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this container"
    )


def extract_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-blob metadata via Arrow-batched mapInPandas.

    The pandas path is deliberate: it exercises the exact batch shape a
    real decoder would use (bytes in → features out), with a
    deterministic fake (byte length + kind sniff) standing in for the
    decode call.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf["blob"].map(len).astype("int64"),
                    # kind sniff: real impl would dispatch on magic bytes
                    "kind": "text/plain",
                }
            )

    return df.select(id_col, "blob").mapInPandas(op, schema=META_SCHEMA)
