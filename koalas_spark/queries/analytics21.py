"""Round-8 batch-16 additions (SURVEY.md §2 extensions): session
entry-type engagement (bounce rate), order-fulfillment lag
quantiles, and customer reactivation counting.

Reference parity note: none of these exist in the reference (its
surface is the frame ops in source/koalas/dataframe.d:73-311); they
extend the product-analytics / operations shelves under the repo
determinism rules (queries/__init__.py docstring): per-entity lag
windows whose partitions are bounded by one entity's activity,
domain-histogram quantiles, exact integer ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 287. session entry-type engagement — the product-analytics staple:
# group #32's sessions by their ENTRY event type and report bounce
# rate (single-event sessions) and average depth. Sessionization is
# the same 30-minute-gap prefix-sum over per-user windows (bounded by
# one user's activity); the entry type is the struct-min trick
# min(struct(ts, event_id, type)) — deterministic under the same
# total order both engines use. Output: one row per event type.
@query(
    "entry_type_engagement",
    oracle="""
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN LAG(sec) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                OR sec - LAG(sec) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                   > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM (SELECT user_id, ts, event_id, event_type,
                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
          FROM events) e0) a),
r AS (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn
  FROM s),
sess AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS depth
  FROM s GROUP BY user_id, sid),
e AS (
  SELECT r.event_type AS entry_type, sess.depth
  FROM sess JOIN r ON r.user_id = sess.user_id AND r.sid = sess.sid
  WHERE r.rn = 1)
SELECT entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       1000000 * CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
         // COUNT(*) AS bounce_ppm,
       1000 * CAST(SUM(depth) AS BIGINT) // COUNT(*) AS avg_depth_milli
FROM e GROUP BY entry_type
""",
)
def entry_type_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    s = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("is_new", is_new)
        .withColumn(
            "sid",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
    )
    wr = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    r = s.withColumn("rn", F.row_number().over(wr))
    sess = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("bigint").alias("depth")
    )
    e = sess.join(
        r.filter(F.col("rn") == 1).select(
            "user_id", "sid", F.col("event_type").alias("entry_type")
        ),
        ["user_id", "sid"],
    ).select("entry_type", "depth")
    return e.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.expr(
            "1000000 * CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END)"
            " AS BIGINT) div COUNT(*)"
        ).alias("bounce_ppm"),
        F.expr("1000 * CAST(SUM(depth) AS BIGINT) div COUNT(*)").alias(
            "avg_depth_milli"
        ),
    )


# --------------------------------------------------------------------
# 288. order fulfillment lag quantiles — the operations SLA view:
# days from order date to the LAST line shipment, exact p50/p90/p99
# per order priority via the #227 domain histogram (lag days are a
# bounded domain — ~4 months of allowed ship window in this schema,
# and a bounded business rule at any scale). One key-partitioned
# aggregate builds per-order lags; everything after runs on the
# (priority x lag-day) domain.
@query(
    "fulfillment_lag_quantiles",
    oracle="""
WITH lag_t AS (
  SELECT o.o_orderpriority AS prio,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        MAX(CAST(l.l_shipdate AS DATE))) AS BIGINT) AS lagd
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate),
h AS (
  SELECT prio, lagd, CAST(COUNT(*) AS BIGINT) AS c
  FROM lag_t GROUP BY 1, 2),
cum AS (
  SELECT prio, lagd, c,
         CAST(SUM(c) OVER (PARTITION BY prio ORDER BY lagd
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cumc
  FROM h),
tot AS (SELECT prio, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY prio)
SELECT cum.prio, tot.n AS n_orders,
       CAST(MIN(CASE WHEN cumc >= (tot.n + 1) // 2 THEN lagd END)
         AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN cumc >= (9 * tot.n + 9) // 10 THEN lagd END)
         AS BIGINT) AS p90_days,
       CAST(MIN(CASE WHEN cumc >= (99 * tot.n + 99) // 100 THEN lagd END)
         AS BIGINT) AS p99_days
FROM cum JOIN tot ON cum.prio = tot.prio
GROUP BY cum.prio, tot.n
""",
)
def fulfillment_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    lag_t = (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.datediff(
                F.col("last_ship"), F.col("o_orderdate").cast("date")
            )
            .cast("bigint")
            .alias("lagd"),
        )
    )
    h = lag_t.groupBy("prio", "lagd").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("prio").orderBy("lagd").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = h.select(
        "prio", "lagd", "c", F.sum("c").over(w).cast("bigint").alias("cumc")
    )
    tot = h.groupBy("prio").agg(F.sum("c").cast("bigint").alias("n"))
    pick = lambda expr: F.min(  # noqa: E731
        F.when(F.col("cumc") >= F.expr(expr), F.col("lagd"))
    ).cast("bigint")
    return (
        cum.join(F.broadcast(tot), "prio")
        .groupBy("prio", "n")
        .agg(
            pick("(n + 1) div 2").alias("p50_days"),
            pick("(9 * n + 9) div 10").alias("p90_days"),
            pick("(99 * n + 99) div 100").alias("p99_days"),
        )
        .select(
            "prio",
            F.col("n").alias("n_orders"),
            "p50_days",
            "p90_days",
            "p99_days",
        )
    )


# --------------------------------------------------------------------
# 289. customer reactivation — the win-back metric: orders placed
# after a >180-day silence from the SAME customer, counted per order
# year next to the total so the reactivation share is visible. The
# gap is a per-customer lag window (partition bounded by one
# customer's order history); the report is a year-domain aggregate.
@query(
    "customer_reactivation",
    oracle="""
WITH g AS (
  SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         date_diff('day',
             LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
             CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders)
SELECT yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN gap_days > 180 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reactivations,
       1000000 * CAST(SUM(CASE WHEN gap_days > 180 THEN 1 ELSE 0 END)
         AS BIGINT) // COUNT(*) AS reactivation_ppm
FROM g GROUP BY yr
""",
)
def customer_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), F.col("o_orderkey")
    )
    g = o.select(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("yr"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    )
    return g.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("gap_days") > 180, 1).otherwise(0))
        .cast("bigint")
        .alias("n_reactivations"),
        F.expr(
            "1000000 * CAST(SUM(CASE WHEN gap_days > 180 THEN 1 ELSE 0 END)"
            " AS BIGINT) div COUNT(*)"
        ).alias("reactivation_ppm"),
    )
