"""Round-10 batch-12 addition (SURVEY.md §2 extensions): the
year-over-year revenue bridge.

Reference parity note: not in the reference (its surface is the frame
ops in source/koalas/dataframe.d:73-311); determinism per the repo
rules (queries/__init__.py docstring): exact integer cents throughout,
no division anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 434. revenue bridge 1997 -> 1998 — the waterfall every revenue
# review opens with: total delta decomposed into NEW customers (98
# only), CHURNED (97 only, negative), EXPANSION (both years, grew)
# and CONTRACTION (both years, shrank), with customer counts per
# bucket. Identity audited in-row: the four deltas sum to
# rev98 - rev97 exactly (pure integer cents, no division anywhere).
# One customer-year rollup + one bounded 4-row collapse.
@query(
    "revenue_bridge_yoy",
    oracle="""
WITH cy AS (
  SELECT o_custkey AS k,
         CAST(COALESCE(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
               THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
           AS BIGINT) AS c97,
         CAST(COALESCE(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998
               THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END), 0)
           AS BIGINT) AS c98
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
  GROUP BY o_custkey),
b AS (
  SELECT CASE
           WHEN c97 = 0 THEN 'new'
           WHEN c98 = 0 THEN 'churned'
           WHEN c98 > c97 THEN 'expansion'
           ELSE 'contraction' END AS bucket,
         c98 - c97 AS delta
  FROM cy)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(delta) AS BIGINT) AS delta_cents
FROM b GROUP BY bucket ORDER BY bucket
""",
)
def revenue_bridge_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    ).filter(F.col("yr").isin(1997, 1998))
    cy = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.coalesce(
            F.sum(F.when(F.col("yr") == 1997, F.col("cents"))), F.lit(0)
        )
        .cast("bigint")
        .alias("c97"),
        F.coalesce(
            F.sum(F.when(F.col("yr") == 1998, F.col("cents"))), F.lit(0)
        )
        .cast("bigint")
        .alias("c98"),
    )
    b = cy.select(
        F.when(F.col("c97") == 0, "new")
        .when(F.col("c98") == 0, "churned")
        .when(F.col("c98") > F.col("c97"), "expansion")
        .otherwise("contraction")
        .alias("bucket"),
        (F.col("c98") - F.col("c97")).alias("delta"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("delta").cast("bigint").alias("delta_cents"),
        )
        .orderBy("bucket")
    )
