"""Similarity-search / clustering queries over the embeddings table (§2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koalas_spark.operators.similarity import brute_force_topk, lsh_topk
from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t

_COS = (
    "list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / SQRT(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))"
    " * list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))"
)


# 42. exact ANN baseline: top-5 cosine neighbors of 5 probe vectors.
@query(
    "ann_bruteforce_topk",
    oracle=f"""
SELECT probe_id, neighbor_id, cos_sim, rk FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         ROUND({_COS}, 6) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY p.vec_id
                            ORDER BY ROUND({_COS}, 6) DESC, c.vec_id ASC) AS rk
  FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
  WHERE p.vec_id < 5) t
WHERE rk <= 5
""",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, probes, "vec_id", "embedding", k=5)


# 43. LSH-bucketed ANN (rows-only: the hyperplane family is built from
# xxhash64; recall vs the brute-force baseline is asserted in tests).
@query("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, probes, "vec_id", "embedding", k=5, num_planes=8, dim=64)


# 80. distributed k-means (Lloyd) — iterative algorithm: broadcast
# centroids, one map pass + one k-row shuffle per iteration, nothing
# but the centroid matrix ever reaches the driver (rows-only: tests
# assert exact agreement with an independent numpy implementation).
@query("kmeans_clusters", oracle=None)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.operators.clustering import kmeans_lloyd

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, "vec_id", "embedding", k=8, iters=3)


# 135. int8-quantized ANN — the memory lever for billion-vector search
# (4x smaller corpus, integer dot products). The quantize is
# engine-portable by construction: half-up rounding via floor(x+0.5)
# and integer-only scoring, so the DuckDB oracle reproduces every
# qdot BIGINT bit-for-bit and the ranking exactly.
@query(
    "ann_int8_topk",
    oracle="""
WITH q AS (
  SELECT vec_id,
         CASE WHEN amax = 0 THEN list_transform(emb, x -> CAST(0 AS BIGINT))
              ELSE list_transform(emb, x -> CAST(FLOOR(x * 127.0 / amax + 0.5) AS BIGINT))
         END AS qv
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> ABS(x))) AS amax
        FROM embeddings)),
qn AS (
  SELECT vec_id, qv,
         CAST(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS BIGINT) AS n
  FROM q)
SELECT probe_id, neighbor_id, qdot, qcos, rk FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(CAST(p.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[])) AS BIGINT) AS qdot,
         ROUND(list_dot_product(CAST(p.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[]))
               / SQRT(CAST(p.n * c.n AS DOUBLE)), 6) AS qcos,
         ROW_NUMBER() OVER (
           PARTITION BY p.vec_id
           ORDER BY ROUND(list_dot_product(CAST(p.qv AS DOUBLE[]), CAST(c.qv AS DOUBLE[]))
                          / SQRT(CAST(p.n * c.n AS DOUBLE)), 6) DESC,
                    c.vec_id ASC) AS rk
  FROM qn p JOIN qn c ON p.vec_id != c.vec_id
  WHERE p.vec_id < 5 AND p.n > 0 AND c.n > 0) t
WHERE rk <= 5
""",
)
def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.operators.similarity import int8_brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return int8_brute_force_topk(emb, probes, "vec_id", "embedding", k=5)
