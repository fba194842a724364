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


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 256,
    stride: int = 4,
) -> DataFrame:
    """Sample every ``stride``-th fixed-size frame from each blob.

    The video-pipeline shape: a payload splits into frames, a strided
    subset is kept, each sampled frame gets a content hash. Entirely
    JVM-side (sequence → explode → substring → sha2): the per-frame
    fan-out happens AFTER partitioning, so a task only ever expands
    its own rows — no shuffle, scales linearly with corpus bytes.
    A real decoder replaces the byte-slice with ffmpeg frame extraction
    inside mapInPandas; the row shape stays identical."""
    nframes = F.ceil(F.length("blob") / F.lit(frame_bytes)).cast("int")
    idx = F.sequence(F.lit(0), nframes - 1, F.lit(stride))
    out = (
        df.select(id_col, "blob")
        .filter(F.length("blob") > 0)
        .withColumn("frame_no", F.explode(idx))
    )
    frame = F.expr(f"substring(blob, frame_no * {frame_bytes} + 1, {frame_bytes})")
    return out.select(
        id_col,
        "frame_no",
        F.length(frame).cast("long").alias("frame_len"),
        F.sha2(frame, 256).alias("frame_sha"),
    )


def byte_histogram_features(
    df: DataFrame, id_col: str = "doc_id", bins: int = 16
) -> DataFrame:
    """Fixed-width feature vector per blob via Arrow-batched
    mapInPandas — the image-embedding pipeline shape (bytes in, float
    vector out). The stand-in featurizer is a REAL computation (L1-
    normalized histogram of byte values into ``bins`` buckets, numpy
    vectorized per batch); a real deployment swaps in decode +
    model inference per batch without touching the Spark plumbing."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["blob"]:
                arr = np.frombuffer(blob, dtype=np.uint8)
                if arr.size == 0:
                    feats.append(np.zeros(bins, dtype=np.float64))
                    continue
                hist = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)[:bins]
                feats.append(hist / arr.size)
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return df.select(id_col, "blob").mapInPandas(
        op, schema="doc_id bigint, features array<double>"
    )


def resize_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    src_w: int = 16,
    target_w: int = 8,
    target_h: int = 8,
) -> DataFrame:
    """Image-resize pipeline shape: blob + typed dimension metadata in,
    resized blob + new dimensions out, through Arrow-batched
    mapInPandas.

    Each blob is viewed as a row-major ``src_w``-wide byte raster
    (height = len/src_w) and downsampled to ``target_h x target_w`` by
    nearest-neighbor index sampling — a REAL vectorized computation
    with the exact shape of a PIL/cv2 resize (decode → ndarray →
    strided gather → re-encode), so swapping in a real decoder touches
    only the two marked lines. Blobs shorter than one source row are
    passed through untouched with null dims, the malformed-media path
    a production pipeline needs."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blob, out_w, out_h = [], [], []
            for blob in pdf["blob"]:
                arr = np.frombuffer(blob, dtype=np.uint8)  # decode_stub seam
                src_h = arr.size // src_w
                if src_h < 1:
                    out_blob.append(bytes(blob))
                    out_w.append(None)
                    out_h.append(None)
                    continue
                img = arr[: src_h * src_w].reshape(src_h, src_w)
                ys = (np.arange(target_h) * src_h) // target_h
                xs = (np.arange(target_w) * src_w) // target_w
                small = img[np.ix_(ys, xs)]  # re-encode seam
                out_blob.append(small.tobytes())
                out_w.append(target_w)
                out_h.append(target_h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "resized": out_blob,
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                }
            )

    return df.select(id_col, "blob").mapInPandas(
        op, schema="doc_id bigint, resized binary, width int, height int"
    )
