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
