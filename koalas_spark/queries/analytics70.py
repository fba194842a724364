"""Round-11 batch-5 additions (SURVEY.md §2 extensions): log-log
price elasticity per brand, the null-skew join split (the production
outer-join mitigation), and autocorrelation pitch detection over the
staged real WAVs.

Reference parity note: none of these exist in the reference (its
surface is the frame ops in source/koalas/dataframe.d:73-311); they
extend the econometrics / join-engineering / audio shelves under the
repo determinism rules (queries/__init__.py docstring): #221 nano-ln
quantization, DECIMAL(38) OLS cross-products, exact integer
autocorrelations, result-invariant plan rewrites proven by a
plain-plan oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 461. log-log price elasticity of demand per brand — the pricing
# econometric (elasticity < -1 = elastic, revenue falls when price
# rises): per (brand, price-cent) demand aggregate, OLS of ln(qty) on
# ln(price) within each brand. Both lns are ratios/values of exact
# integers, nano-quantized per (brand, price) CELL (#221 — the cell
# domain is value-bounded); slope via exact DECIMAL(38) cross-
# products, one double exit per brand. Corpus work: one map-side-
# combined groupBy; the regression runs on the bounded cell table.
@query(
    "price_elasticity_brands",
    oracle="""
WITH cell AS (
  SELECT p.p_brand AS brand,
         CAST(FLOOR(l.l_extendedprice / l.l_quantity * 100 + 0.5) AS BIGINT)
           AS unit_cents,
         CAST(SUM(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2),
pts AS (
  SELECT brand,
         CAST(FLOOR(LN(CAST(unit_cents AS DOUBLE)) * 1000000000 + 0.5)
           AS BIGINT) AS x,
         CAST(FLOOR(LN(CAST(q AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)
           AS y
  FROM cell WHERE unit_cents > 0 AND q > 0),
fit AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
  FROM pts GROUP BY brand)
SELECT brand, np AS n_points,
       ROUND(CAST(CAST(np * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(np * sxx - sx * sx AS VARCHAR) AS DOUBLE), 6)
         AS elasticity
FROM fit WHERE np >= 2
""",
)
def price_elasticity_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.plans.session import dim

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(
            F.col("l_extendedprice") / F.col("l_quantity") * 100 + 0.5
        )
        .cast("bigint")
        .alias("unit_cents"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("qi"),
    )
    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    cell = (
        li.join(dim(p, "part"), "l_partkey")
        .groupBy("brand", "unit_cents")
        .agg(F.sum("qi").cast("bigint").alias("q"))
    )
    pts = cell.filter(
        (F.col("unit_cents") > 0) & (F.col("q") > 0)
    ).select(
        "brand",
        F.floor(
            F.log(F.col("unit_cents").cast("double")) * 1000000000 + 0.5
        )
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("q").cast("double")) * 1000000000 + 0.5)
        .cast("bigint")
        .alias("y"),
    )
    fit = pts.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum(F.col("x").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    return fit.filter(F.col("np") >= 2).select(
        "brand",
        F.col("np").alias("n_points"),
        F.round(
            (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("string")
            .cast("double")
            / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("string")
            .cast("double"),
            6,
        ).alias("elasticity"),
    )


# --------------------------------------------------------------------
# 462. null-skew join split — the production outer-join mitigation
# the salted join (#147) and AQE skew split (#396) don't cover: when
# a LEFT join key is heavily NULL (here: a synthetic consent-style
# key, NULL unless custkey % 5 == 0), every NULL row hashes to ONE
# shuffle partition and can never match anyway. The rewrite routes
# NULL-key rows AROUND the join (union of matched branch + null
# branch with null-filled right columns) — result-invariant by
# definition of outer-join-on-null. The oracle runs the PLAIN left
# join, so the equivalence is value-checked, and the null branch
# never shuffles (narrow filter + union).
@query(
    "null_skew_join_split",
    oracle="""
WITH o AS (
  SELECT CASE WHEN o_custkey % 5 = 0 THEN o_custkey END AS jk,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
j AS (
  SELECT o.jk, o.cents, c.c_nationkey
  FROM o LEFT JOIN customer c ON c.c_custkey = o.jk)
SELECT CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS nation_or_null,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM j GROUP BY 1
""",
)
def null_skew_join_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % 5 == 0, F.col("o_custkey")).alias("jk"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias(
            "cents"
        ),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("jk"), F.col("c_nationkey")
    )
    # the split: non-null keys take the real join; null keys bypass it
    matched = o.filter(F.col("jk").isNotNull()).join(c, "jk", "left")
    nulls = o.filter(F.col("jk").isNull()).withColumn(
        "c_nationkey", F.lit(None).cast(dict(c.dtypes)["c_nationkey"])
    )
    j = matched.select("cents", "c_nationkey").unionByName(
        nulls.select("cents", "c_nationkey")
    )
    return j.groupBy(
        F.coalesce(F.col("c_nationkey"), F.lit(-1))
        .cast("bigint")
        .alias("nation_or_null")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("cents"),
    )


# --------------------------------------------------------------------
# 463. autocorrelation pitch probe over the staged REAL WAVs — the
# classic monophonic pitch detector (argmax of the autocorrelation
# over candidate lags): per doc, EXACT int64 autocorrelation
# R(l) = sum_i s[i]*s[i+l] at the 3 candidate lags {25, 50, 100}
# (~1600/800/400 Hz at the staged 16 kHz), winner = max R, ties to
# the SMALLEST lag (deterministic). Integer products of PCM16
# samples, so the oracle replays R(l) exactly from the text's char
# pairs; frequencies stay out (one division would be fine, but the
# lag IS the answer).
@query(
    "multimodal_audio_pitch",
    oracle="""
WITH src AS (
  SELECT doc_id, substring(text, 1, 400) AS d
  FROM documents WHERE octet_length(encode(text)) >= 400),
s AS (
  SELECT doc_id,
         list_transform(range(0, 200),
           i -> CAST(ascii(substring(d, CAST(2*i + 1 AS BIGINT), 1))
                + 256 * ascii(substring(d, CAST(2*i + 2 AS BIGINT), 1))
                AS BIGINT)) AS sm
  FROM src),
r AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, 175),
           i -> sm[i + 1] * sm[i + 26])) AS r25,
         list_sum(list_transform(range(0, 150),
           i -> sm[i + 1] * sm[i + 51])) AS r50,
         list_sum(list_transform(range(0, 100),
           i -> sm[i + 1] * sm[i + 101])) AS r100
  FROM s)
SELECT doc_id,
       CAST(r25 AS BIGINT) AS r25, CAST(r50 AS BIGINT) AS r50,
       CAST(r100 AS BIGINT) AS r100,
       CAST(CASE WHEN r25 >= r50 AND r25 >= r100 THEN 25
                 WHEN r50 >= r100 THEN 50 ELSE 100 END AS BIGINT)
         AS pitch_lag
FROM r
""",
)
def multimodal_audio_pitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from koalas_spark.operators.multimodal import audio_pitch_probe

    HDR = (
        "52494646b401000057415645666d7420100000000100"
        "0100803e0000007d0000020010006461746190010000"
    )
    docs = _t(spark, sf_dir, "documents").filter(F.octet_length("text") >= 400)
    wav = docs.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit(HDR)),
            F.substring(F.encode(F.col("text"), "UTF-8"), 1, 400),
        ).alias("blob"),
    )
    return audio_pitch_probe(wav, "doc_id", lags=(25, 50, 100))
