"""Round-9 batch-14 additions (SURVEY.md §2 extensions): top-k with
ties (RANK semantics), grouped harmonic mean, Tukey-fence outlier
rates.

Reference parity note: none of these exist in the reference (its
surface is the frame ops in source/koalas/dataframe.d:73-311); they
extend the reporting / statistics shelves under the repo determinism
rules (queries/__init__.py docstring): per-value nano-quantized
reciprocals (#221 family), histogram-prefix-sum order statistics
(#227), exact integer division on non-negative operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 337. top-k WITH TIES per nation — the FETCH FIRST k ROWS WITH TIES
# semantic (#28's row_number variant arbitrarily breaks equal-revenue
# ties; audit-grade reports must not): per supplier nation, every
# supplier whose RANK() by exact revenue cents is ≤ 3 — equal totals
# all surface, so the output is fully determined by the data with NO
# tie-break arbitrariness to keep in sync across engines. One
# lineitem⋈supplier equi-join (dim side broadcastable), one
# nation-partitioned rank window over the per-supplier aggregate.
@query(
    "topk_with_ties_per_nation",
    oracle="""
WITH s AS (
  SELECT su.s_nationkey AS nation, su.s_suppkey AS suppkey,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN supplier su ON l.l_suppkey = su.s_suppkey
  GROUP BY 1, 2)
SELECT nation, suppkey, cents, rk FROM (
  SELECT nation, suppkey, cents,
         CAST(RANK() OVER (PARTITION BY nation ORDER BY cents DESC)
              AS INT) AS rk
  FROM s) t
WHERE rk <= 3
""",
)
def topk_with_ties_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("bigint")
        .alias("c"),
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    s = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.col("s_suppkey").alias("suppkey"),
        )
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    wk = Window.partitionBy("nation").orderBy(F.col("cents").desc())
    return (
        s.withColumn("rk", F.rank().over(wk).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("nation", "suppkey", "cents", "rk")
    )


# --------------------------------------------------------------------
# 338. grouped harmonic mean — the rate-averaging mean (the right
# aggregate for prices-per-unit and speeds, completing the
# Pythagorean family next to #282's geometric mean): per order
# priority, n / Σ(1/x) with each reciprocal quantized to exact
# femto-units PER VALUE (1e15/cents is an exact integer division —
# order-independent integer sums, the #221 discipline applied to 1/x)
# and the final mean n/Σ recovered as ONE identical-shape double
# (the all-integer n·1e15 numerator wraps int64 at sf1 — Spark ANSI
# caught it; the reciprocal SUM stays exact). One map-side-combined
# corpus groupBy.
@query(
    "harmonic_mean_price",
    oracle="""
WITH s AS (
  SELECT o_orderpriority AS pri,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
m AS (
  SELECT pri, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(1000000000000000 // cents) AS BIGINT) AS sum_recip_femto
  FROM s WHERE cents > 0 GROUP BY 1)
SELECT pri, n, sum_recip_femto,
       ROUND(CAST(n AS DOUBLE) * 1000000000000000.0
             / CAST(sum_recip_femto AS DOUBLE), 6) AS harmonic_mean_cents
FROM m
""",
)
def harmonic_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    ).filter(F.col("cents") > 0)
    m = o.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("1000000000000000 div cents"))
        .cast("bigint")
        .alias("sum_recip_femto"),
    )
    return m.select(
        "pri",
        "n",
        "sum_recip_femto",
        F.round(
            F.expr(
                "CAST(n AS DOUBLE) * 1000000000000000.0"
                " / CAST(sum_recip_femto AS DOUBLE)"
            ),
            6,
        ).alias("harmonic_mean_cents"),
    )


# --------------------------------------------------------------------
# 339. Tukey-fence outlier rates — the boxplot standard (complements
# #166's MAD gate with the quartile-based fences every BI tool
# draws): per order priority, Q1/Q3 from prefix sums over the
# per-priority cents HISTOGRAM (#227 discipline — never a per-group
# sort), fences at Q1 − 3·IQR/2 and Q3 + 3·IQR/2 in exact integer
# arithmetic (×2 scaling keeps the half-IQR integral), and outlier
# counts from one more pass over the same bounded histogram.
@query(
    "iqr_fence_outlier_rate",
    oracle="""
WITH h AS (
  SELECT o_orderpriority AS pri,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2),
cum AS (
  SELECT pri, cents, c,
         CAST(SUM(c) OVER (PARTITION BY pri ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cm,
         CAST(SUM(c) OVER (PARTITION BY pri) AS BIGINT) AS n
  FROM h),
q AS (
  SELECT pri, MAX(n) AS n,
         CAST(MIN(CASE WHEN cm * 4 >= n THEN cents END) AS BIGINT) AS q1,
         CAST(MIN(CASE WHEN cm * 4 >= 3 * n THEN cents END) AS BIGINT) AS q3
  FROM cum GROUP BY pri),
f AS (
  SELECT pri, n, q1, q3,
         2 * q1 - 3 * (q3 - q1) AS lo2,
         2 * q3 + 3 * (q3 - q1) AS hi2
  FROM q)
SELECT f.pri, f.n, f.q1, f.q3,
       CAST(SUM(CASE WHEN 2 * h.cents < f.lo2 OR 2 * h.cents > f.hi2
                THEN h.c ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN 2 * h.cents < f.lo2 OR 2 * h.cents > f.hi2
                THEN h.c ELSE 0 END) * 1000000 // f.n AS BIGINT)
         AS outlier_ppm
FROM f JOIN h ON h.pri = f.pri
GROUP BY f.pri, f.n, f.q1, f.q3
""",
)
def iqr_fence_outlier_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    h = o.groupBy("pri", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = (
        Window.partitionBy("pri")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wp = Window.partitionBy("pri")
    cum = h.select(
        "pri",
        "cents",
        "c",
        F.sum("c").over(wc).cast("bigint").alias("cm"),
        F.sum("c").over(wp).cast("bigint").alias("n"),
    )
    q = cum.groupBy("pri").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cm") * 4 >= F.col("n"), F.col("cents")))
        .cast("bigint")
        .alias("q1"),
        F.min(F.when(F.col("cm") * 4 >= 3 * F.col("n"), F.col("cents")))
        .cast("bigint")
        .alias("q3"),
    )
    f = q.select(
        "pri",
        "n",
        "q1",
        "q3",
        (2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))).alias("lo2"),
        (2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))).alias("hi2"),
    )
    j = f.join(h, "pri")
    return j.groupBy("pri", "n", "q1", "q3").agg(
        F.sum(
            F.when(
                (2 * F.col("cents") < F.col("lo2"))
                | (2 * F.col("cents") > F.col("hi2")),
                F.col("c"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
        F.expr(
            "CAST(SUM(CASE WHEN 2 * cents < lo2 OR 2 * cents > hi2"
            " THEN c ELSE 0 END) * 1000000 div n AS BIGINT)"
        ).alias("outlier_ppm"),
    )
