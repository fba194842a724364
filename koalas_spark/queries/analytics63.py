"""Round-10 batch-11 additions (SURVEY.md §2 extensions): per-dimension
embedding statistics.

Reference parity note: not in the reference (its surface is the frame
ops in source/koalas/dataframe.d:73-311); determinism per the repo
rules (queries/__init__.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 431. per-DIMENSION embedding statistics — the feature-normalization
# prep every embedding pipeline runs before whitening/quantization
# (#108 profiles per-VECTOR norms; this is the transpose): posexplode
# each vector once, one (dim)-keyed aggregate for count/min/max/mean
# and the uncorrected second moment. Float discipline: embedding
# floats are 1e6-quantized to integers PER VALUE before the sums (the
# #221 rule — float sums are addend-order-dependent under shuffle),
# so min/max/moment sums are exact integers; the two output doubles
# divide those exact integers in one identical shape per engine. Scale:
# the shuffle is |corpus| x d rows keyed by d dims — partial
# aggregation collapses it map-side to d rows per task.
@query(
    "embedding_dim_stats",
    oracle="""
WITH d AS (
  SELECT UNNEST(generate_series(1,
           (SELECT MAX(len(embedding)) FROM embeddings))) AS i),
x AS (
  SELECT d.i - 1 AS dim,
         CAST(FLOOR(CAST(e.embedding[d.i] AS DOUBLE) * 1000000 + 0.5)
           AS BIGINT) AS q
  FROM embeddings e JOIN d ON d.i <= len(e.embedding)),
s AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(q) AS BIGINT) AS min_q,
         CAST(MAX(q) AS BIGINT) AS max_q,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS s2
  FROM x GROUP BY dim)
SELECT CAST(dim AS INT) AS dim, n, min_q, max_q,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
         AS mean_val,
       ROUND((CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             / 1000000000000.0, 6) AS var_val
FROM s ORDER BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "v")
    )
    x = e.select(
        "dim",
        F.floor(F.col("v").cast("double") * 1000000 + 0.5)
        .cast("bigint")
        .alias("q"),
    )
    s = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("q").cast("bigint").alias("min_q"),
        F.max("q").cast("bigint").alias("max_q"),
        F.sum("q").cast("bigint").alias("s1"),
        F.expr("CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0))").alias(
            "s2"
        ),
    )
    return s.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        "min_q",
        "max_q",
        F.round(
            F.expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0"), 6
        ).alias("mean_val"),
        F.round(
            F.expr(
                "(CAST(CAST(s2 AS STRING) AS DOUBLE) / CAST(n AS DOUBLE)"
                " - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
                " * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))"
                " / 1000000000000.0"
            ),
            6,
        ).alias("var_val"),
    ).orderBy("dim")
