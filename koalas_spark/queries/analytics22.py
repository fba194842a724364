"""Round-8 batch-17 additions (SURVEY.md §2 extensions): hour-of-day
traffic profiles and supplier-concentration HHI.

Reference parity note: none of these exist in the reference (its
surface is the frame ops in source/koalas/dataframe.d:73-311); two
compact reporting/competition-analysis shapes under the repo
determinism rules (queries/__init__.py docstring): exact integer
ppm, non-negative division, domain-bounded everything after one
corpus aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 290. hour-of-day traffic profile — the capacity-planning heatmap
# row: per event type, the ppm share of traffic in each of the 24
# hours plus the peak hour. ONE map-side-combined (type x hour)
# count; shares and the argmax run on the 120-cell domain. Peak hour
# ties break to the earliest hour via min-over-filtered (the exact
# max is computed first, then the smallest hour attaining it).
@query(
    "hour_of_day_profile",
    oracle="""
WITH h AS (
  SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM h
        GROUP BY event_type),
mx AS (SELECT event_type, CAST(MAX(c) AS BIGINT) AS mc FROM h
       GROUP BY event_type),
peak AS (
  SELECT h.event_type, CAST(MIN(h.hr) AS BIGINT) AS peak_hour
  FROM h JOIN mx ON h.event_type = mx.event_type AND h.c = mx.mc
  GROUP BY h.event_type)
SELECT h.event_type, h.hr, h.c AS n_events,
       1000000 * h.c // tot.n AS share_ppm,
       peak.peak_hour
FROM h JOIN tot ON h.event_type = tot.event_type
JOIN peak ON h.event_type = peak.event_type
""",
)
def hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).localCheckpoint(
        eager=False
    )
    tot = h.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("n"))
    mx = h.groupBy("event_type").agg(F.max("c").cast("bigint").alias("mc"))
    peak = (
        h.join(F.broadcast(mx), "event_type")
        .filter(F.col("c") == F.col("mc"))
        .groupBy("event_type")
        .agg(F.min("hr").cast("bigint").alias("peak_hour"))
    )
    return (
        h.join(F.broadcast(tot), "event_type")
        .join(F.broadcast(peak), "event_type")
        .select(
            "event_type",
            "hr",
            F.col("c").alias("n_events"),
            F.expr("1000000 * c div n").alias("share_ppm"),
            "peak_hour",
        )
    )


# --------------------------------------------------------------------
# 291. supplier-concentration HHI per nation — the
# Herfindahl-Hirschman index competition regulators use: the sum of
# squared revenue shares of each nation's suppliers. One corpus
# aggregate builds (nation, supplier) revenue; shares are integer
# ppm; HHI = sum share_ppm^2 // 1e6 stays in the conventional
# 0..1e6 range exactly (monopoly = 1e6). Everything after the
# aggregate runs on the supplier-per-nation domain. HHI above 2500
# points (DOJ's "highly concentrated" line, 250000 ppm-scale) is
# flagged.
@query(
    "supplier_concentration_hhi",
    oracle="""
WITH sr AS (
  SELECT n.n_name, l.l_suppkey,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS rev
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name, l.l_suppkey),
tot AS (SELECT n_name, CAST(SUM(rev) AS BIGINT) AS t FROM sr
        GROUP BY n_name),
sh AS (
  SELECT sr.n_name, 1000000 * sr.rev // tot.t AS share_ppm
  FROM sr JOIN tot ON sr.n_name = tot.n_name)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
       CASE WHEN SUM(share_ppm * share_ppm) // 1000000 > 250000
            THEN 1 ELSE 0 END AS highly_concentrated
FROM sh GROUP BY n_name
""",
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sr = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
            )
            .cast("bigint")
            .alias("rev")
        )
    )
    tot = sr.groupBy("n_name").agg(F.sum("rev").cast("bigint").alias("t"))
    sh = sr.join(F.broadcast(tot), "n_name").select(
        "n_name", F.expr("1000000 * rev div t").alias("share_ppm")
    )
    return sh.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.expr("CAST(SUM(share_ppm * share_ppm) div 1000000 AS BIGINT)")
        .alias("hhi_ppm"),
        F.expr(
            "CASE WHEN SUM(share_ppm * share_ppm) div 1000000 > 250000"
            " THEN 1 ELSE 0 END"
        )
        .cast("int")
        .alias("highly_concentrated"),
    )
