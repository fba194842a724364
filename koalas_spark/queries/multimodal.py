"""Multimodal plumbing query (§2.6): binary blob column + Arrow-batched
metadata extraction + JVM-side content hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koalas_spark.operators.multimodal import extract_meta, with_blob
from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# 49. blob metadata: byte length via mapInPandas (Arrow batch path),
# sha256 via JVM expression — both oracle-checked against DuckDB.
@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'text/plain' AS kind,
       sha256(text) AS sha
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    blobbed = with_blob(docs, "text")
    meta = extract_meta(blobbed, "doc_id")
    sha = blobbed.select("doc_id", F.sha2(F.col("blob"), 256).alias("sha"))
    return meta.join(sha, "doc_id")


# 72. frame sampling — every 4th 256-byte frame per blob, content-
# hashed. Oracle via char-based slicing: the corpus is pure ASCII
# (asserted in tests), so DuckDB's substring(text)+sha256(varchar)
# equals Spark's binary substring + sha2(binary).
@query(
    "multimodal_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(CEIL(length(text) / 256.0) AS BIGINT), 4)) AS fno
  FROM documents WHERE length(text) > 0)
SELECT doc_id, CAST(fno AS INT) AS frame_no,
       CAST(length(substring(text, CAST(fno*256+1 AS BIGINT), 256)) AS BIGINT) AS frame_len,
       sha256(substring(text, CAST(fno*256+1 AS BIGINT), 256)) AS frame_sha
FROM f
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.operators.multimodal import frame_sample

    docs = _t(spark, sf_dir, "documents")
    return frame_sample(with_blob(docs, "text"), "doc_id", frame_bytes=256, stride=4)


# 73. byte-histogram features — the image-embedding pipeline shape
# (blob → fixed-width float vector) through Arrow mapInPandas.
# Rows-only: the featurizer is numpy-side; unit tests recompute the
# histograms independently and assert exact equality.
@query("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.operators.multimodal import byte_histogram_features

    docs = _t(spark, sf_dir, "documents")
    return byte_histogram_features(with_blob(docs, "text"), "doc_id", bins=16)


# 130. REAL image decode→resize→re-encode: each doc's first 256 bytes
# become an actual 16x16 binary PGM (valid netpbm container, built
# JVM-side: ASCII header ++ byte raster), which decode_image parses
# for real — header tokenizer, geometry, raster offset — then
# nearest-neighbor resizes to 8x8 and re-encodes as PGM. The oracle
# reconstructs the resized file byte-for-byte in SQL: with fixed
# 16->8 geometry the gather is pixel (2i, 2j), i.e. char position
# (k//8)*32 + (k%8)*2 + 1 of the raster (corpus is ASCII, so DuckDB
# chars == Spark bytes), prepended with the same 'P5 8 8 255\n'
# header and sha256'd — a full-value check that the decoder read the
# container correctly, not just that rows came back.
@query(
    "multimodal_decode_resize",
    oracle="""
WITH src AS (
  SELECT doc_id, substring(text, 1, 256) AS raster
  FROM documents WHERE octet_length(encode(text)) >= 256)
SELECT doc_id, 'image/x-portable-graymap' AS kind,
       8 AS width, 8 AS height,
       sha256('P5 8 8 255' || chr(10) ||
              array_to_string(list_transform(range(0, 64),
                  k -> substring(raster, (k // 8) * 32 + (k % 8) * 2 + 1, 1)), ''))
           AS resized_sha
FROM src
""",
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.operators.multimodal import decode_resize_reencode

    docs = _t(spark, sf_dir, "documents").filter(F.octet_length("text") >= 256)
    pgm = docs.select(
        "doc_id",
        F.concat(
            F.encode(F.lit("P5 16 16 255\n"), "UTF-8"),
            F.substring(F.encode(F.col("text"), "UTF-8"), 1, 256),
        ).alias("blob"),
    )
    out = decode_resize_reencode(pgm, "doc_id", target_w=8, target_h=8)
    return out.select(
        "doc_id", "kind", "width", "height", F.sha2("resized", 256).alias("resized_sha")
    )


# 122. resize — nearest-neighbor byte-raster downsample through the
# Arrow batch path (the PIL/cv2 resize shape). The numpy gather is not
# SQL-expressible, so the query is rows-only; tests/test_multimodal.py
# recomputes the resize independently and asserts byte equality, and
# the aggregate here keeps the checked surface small and stable.
@query("multimodal_resize", oracle=None)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.operators.multimodal import resize_frames

    docs = _t(spark, sf_dir, "documents")
    resized = resize_frames(with_blob(docs, "text"), "doc_id")
    return (
        resized.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.length("resized")).cast("bigint").alias("total_bytes"),
            F.md5(F.concat_ws("", F.sort_array(F.collect_list(F.hex("resized"))))).alias(
                "content_md5"
            ),
        )
    )
