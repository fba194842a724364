"""Round-9 batch-27 additions (SURVEY.md §2 extensions): SQL-surface
coverage (GROUP BY ALL, INTERSECT ALL, left-semi subquery) and two
2x2-table statistics (odds-ratio CI, Bartlett's test).

Reference parity note: not in the reference (its surface is the frame
ops in source/koalas/dataframe.d:73-311); determinism per the repo
rules (queries/__init__.py docstring): exact integer counts, one-row
pivots, identical-shape doubles with e-notation literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 378. GROUP BY ALL — the modern SQL shorthand (Spark 4 and DuckDB
# both resolve non-aggregate select items as keys): revenue by
# (returnflag, linestatus) with the keys never repeated in GROUP BY.
# Semantics parity is the point — the resolved plan must equal the
# explicit grouping.
@query(
    "group_by_all_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY ALL ORDER BY 1, 2
""",
)
def group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_gba_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS rev_cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM _gba_lineitem GROUP BY ALL ORDER BY 1, 2
        """
    )


# --------------------------------------------------------------------
# 379. INTERSECT ALL — completes the multiset family next to #75's
# distinct intersect and #205's EXCEPT ALL: parts shipped in BOTH 1997
# and 1998, with multiset multiplicity min(c97, c98) preserved.
@query(
    "set_intersect_all",
    oracle="""
SELECT l_partkey FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
INTERSECT ALL
SELECT l_partkey FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    y97 = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey")
    y98 = li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("l_partkey")
    return y97.intersectAll(y98)


# --------------------------------------------------------------------
# 380. left-semi join — customers with at least one 1998 order, as a
# LEFT SEMI (the EXISTS shape #54's anti join mirrors): the build side
# is the filtered orders projection (pushdown reaches the scan), the
# probe side never duplicates.
@query(
    "semi_join_recent_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= DATE '1998-01-01')
ORDER BY c_custkey
""",
)
def semi_join_recent_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")
    )
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_semi"
    ).orderBy("c_custkey")


# --------------------------------------------------------------------
# 381. odds ratio with 95% CI — the epidemiologist's 2x2 effect size
# (completes kappa #366's table family): does high quantity raise the
# return odds? OR = ad/bc, CI = exp(ln OR +/- 1.96*sqrt(1/a+1/b+1/c+
# 1/d)) — exact counts, one identical-shape double sequence.
@query(
    "odds_ratio_returns",
    oracle="""
WITH r AS (
  SELECT CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS hi,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem),
pv AS (
  SELECT CAST(SUM(CASE WHEN hi = 1 AND ret = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN hi = 1 AND ret = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN hi = 0 AND ret = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(SUM(CASE WHEN hi = 0 AND ret = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM r),
cd AS (
  SELECT a, b, c, d,
         CAST(a AS DOUBLE) AS a_d, CAST(b AS DOUBLE) AS b_d,
         CAST(c AS DOUBLE) AS c_d, CAST(d AS DOUBLE) AS d_d
  FROM pv),
orc AS (
  SELECT a, b, c, d,
         (a_d * d_d) / (b_d * c_d) AS odds,
         1.96e0 * SQRT(1e0 / a_d + 1e0 / b_d + 1e0 / c_d + 1e0 / d_d)
           AS hw
  FROM cd)
SELECT a AS n11, b AS n10, c AS n01, d AS n00,
       ROUND(odds, 6) AS odds_ratio,
       ROUND(EXP(LN(odds) - hw), 6) AS ci_lo,
       ROUND(EXP(LN(odds) + hw), 6) AS ci_hi
FROM orc
""",
)
def odds_ratio_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_quantity") >= 25, 1).otherwise(0).alias("hi"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    pv = li.agg(
        F.sum(F.when((F.col("hi") == 1) & (F.col("ret") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("hi") == 1) & (F.col("ret") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("hi") == 0) & (F.col("ret") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("hi") == 0) & (F.col("ret") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    cd = pv.select(
        "a",
        "b",
        "c",
        "d",
        F.col("a").cast("double").alias("a_d"),
        F.col("b").cast("double").alias("b_d"),
        F.col("c").cast("double").alias("c_d"),
        F.col("d").cast("double").alias("d_d"),
    )
    orc = cd.select(
        "a",
        "b",
        "c",
        "d",
        F.expr("(a_d * d_d) / (b_d * c_d)").alias("odds"),
        F.expr(
            "1.96e0 * SQRT(1e0 / a_d + 1e0 / b_d + 1e0 / c_d + 1e0 / d_d)"
        ).alias("hw"),
    )
    return orc.select(
        F.col("a").alias("n11"),
        F.col("b").alias("n10"),
        F.col("c").alias("n01"),
        F.col("d").alias("n00"),
        F.round(F.col("odds"), 6).alias("odds_ratio"),
        F.round(F.expr("EXP(LN(odds) - hw)"), 6).alias("ci_lo"),
        F.round(F.expr("EXP(LN(odds) + hw)"), 6).alias("ci_hi"),
    )


# --------------------------------------------------------------------
# 382. Bartlett's test of variance homogeneity — the parametric twin
# of #346's Brown-Forsythe (sharper under normality, which is exactly
# when you'd prefer it): exact integer moments per returnflag group
# pivot to one row (the #319 discipline), then the statistic's ln
# terms evaluate as fixed one-row algebra — no quantization needed
# because no double ever crosses a row boundary.
_BT_GROUPS = ("A", "N", "R")
_BT_PIVOT = ",\n         ".join(
    f"MAX(CASE WHEN grp = '{g}' THEN n_g END) AS n_{g.lower()},\n"
    f"         MAX(CASE WHEN grp = '{g}' THEN s_g END) AS s_{g.lower()},\n"
    f"         MAX(CASE WHEN grp = '{g}' THEN ss_g END) AS ss_{g.lower()}"
    for g in _BT_GROUPS
)
_BT_CAST = ",\n       ".join(
    f"CAST(n_{g.lower()} AS DOUBLE) AS n{g.lower()},\n"
    f"       CAST(s_{g.lower()} AS DOUBLE) AS s{g.lower()},\n"
    f"       CAST(CAST(ss_{g.lower()} AS VARCHAR) AS DOUBLE)"
    f" AS ss{g.lower()}"
    for g in _BT_GROUPS
)
_BT_VAR = {
    g: f"((ss{g.lower()} - s{g.lower()} * s{g.lower()} / n{g.lower()})"
    f" / (n{g.lower()} - 1e0))"
    for g in _BT_GROUPS
}
_BT_POOL = (
    "(("
    + " + ".join(
        f"(n{g.lower()} - 1e0) * {_BT_VAR[g]}" for g in _BT_GROUPS
    )
    + ") / (n_d - 3e0))"
)
_BT_STAT = (
    f"((n_d - 3e0) * LN({_BT_POOL}) - ("
    + " + ".join(
        f"(n{g.lower()} - 1e0) * LN({_BT_VAR[g]})" for g in _BT_GROUPS
    )
    + ")) / (1e0 + ("
    + " + ".join(f"1e0 / (n{g.lower()} - 1e0)" for g in _BT_GROUPS)
    + " - 1e0 / (n_d - 3e0)) / 6e0)"
)


@query(
    "bartlett_test_quantity",
    oracle=f"""
WITH gs AS (
  SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS s_g,
         SUM(CAST(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                  AS DECIMAL(38,0))
             * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS ss_g
  FROM lineitem GROUP BY 1),
pv AS (
  SELECT {_BT_PIVOT},
         CAST(SUM(n_g) AS BIGINT) AS n
  FROM gs),
cd AS (
  SELECT n, CAST(n AS DOUBLE) AS n_d,
       {_BT_CAST}
  FROM pv)
SELECT n, ROUND({_BT_STAT}, 6) AS bartlett_stat
FROM cd
""",
)
def bartlett_test_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("v"),
    )
    gs = li.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("v").cast("bigint").alias("s_g"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("ss_g"),
    )
    pv = gs.agg(
        *[
            c
            for g in _BT_GROUPS
            for c in (
                F.max(F.when(F.col("grp") == g, F.col("n_g"))).alias(
                    f"n_{g.lower()}"
                ),
                F.max(F.when(F.col("grp") == g, F.col("s_g"))).alias(
                    f"s_{g.lower()}"
                ),
                F.max(F.when(F.col("grp") == g, F.col("ss_g"))).alias(
                    f"ss_{g.lower()}"
                ),
            )
        ],
        F.sum("n_g").cast("bigint").alias("n"),
    )
    cd = pv.select(
        "n",
        F.col("n").cast("double").alias("n_d"),
        *[
            c
            for g in _BT_GROUPS
            for c in (
                F.col(f"n_{g.lower()}").cast("double").alias(
                    f"n{g.lower()}"
                ),
                F.col(f"s_{g.lower()}").cast("double").alias(
                    f"s{g.lower()}"
                ),
                F.col(f"ss_{g.lower()}")
                .cast("string")
                .cast("double")
                .alias(f"ss{g.lower()}"),
            )
        ],
    )
    return cd.select(
        "n", F.round(F.expr(_BT_STAT), 6).alias("bartlett_stat")
    )
