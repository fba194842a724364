"""Round-9 batch-1 additions (SURVEY.md §2 extensions): SCD2 state
intervals, leakage-safe expanding features, right-to-be-forgotten purge audit, and PII e-mail
redaction.

Reference parity note: none of these exist in the reference (its
surface is the frame ops in source/koalas/dataframe.d:73-311); they
extend the training-data-pipeline and governance shelves under the
repo determinism rules (queries/__init__.py docstring): per-entity
lag/lead windows bounded by one entity's activity, FLOOR(epoch)
timestamp quantization, exact integer ppm, md5/sha portable hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from koalas_spark.queries import query
from koalas_spark.queries.analytics import _t


# --------------------------------------------------------------------
# 290. SCD Type-2 state intervals — the dimension-history build every
# warehouse runs: collapse each user's event_type stream into
# validity intervals [valid_from, valid_to) emitted ONLY at state
# changes (lag != current), open tail NULL. One shuffle on user_id;
# both windows (change detection, next-change lookup) share the same
# (user_id, ts, event_id) sort. Timestamps go through per-value
# FLOOR(epoch) (the repo ts rule); ordering stays full-precision on
# both engines so the total order is identical.
@query(
    "scd2_user_state_intervals",
    oracle="""
WITH s AS (
  SELECT user_id, event_id, event_type, ts,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
  FROM events),
c AS (
  SELECT user_id, event_id, event_type, ts, sec,
         CASE WHEN LAG(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR LAG(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                  <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM s)
SELECT user_id, event_id, event_type,
       sec AS valid_from_sec,
       LEAD(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to_sec
FROM c WHERE chg = 1
""",
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    prev = F.lag("event_type").over(w)
    c = ev.withColumn("sec", sec).withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    )
    changes = c.filter(F.col("chg") == 1)
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("sec").alias("valid_from_sec"),
        F.lead("sec").over(w2).alias("valid_to_sec"),
    )


# --------------------------------------------------------------------
# 291. leakage-safe expanding features — point-in-time-correct
# training features: for every event, the user's PRIOR event count
# and PRIOR value sum/mean, via the exclusive expanding window (ROWS
# UNBOUNDED PRECEDING .. 1 PRECEDING) — the window shape that makes
# label leakage structurally impossible (the current row never sees
# itself or its future). One shuffle on user_id; values quantized to
# exact integer micro-units per the repo rule so the running sums are
# addend-order-independent; the mean is integer division (operands
# non-negative: value > 0 in this schema).
@query(
    "leakage_safe_expanding_features",
    oracle="""
WITH s AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_micro
  FROM events),
w AS (
  SELECT user_id, event_id,
         CAST(COUNT(*) OVER prior AS BIGINT) AS n_prior,
         CAST(SUM(v_micro) OVER prior AS BIGINT) AS sum_prior_micro
  FROM s
  WINDOW prior AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT user_id, event_id, n_prior, sum_prior_micro,
       CASE WHEN n_prior > 0
            THEN CAST(sum_prior_micro // n_prior AS BIGINT) END
         AS mean_prior_micro
FROM w
""",
)
def leakage_safe_expanding_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    v_micro = F.floor(F.col("value") * 1000000 + 0.5).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = ev.withColumn("v_micro", v_micro).select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_prior"),
        F.sum("v_micro").over(w).cast("bigint").alias("sum_prior_micro"),
    )
    return s.withColumn(
        "mean_prior_micro",
        F.when(
            F.col("n_prior") > 0,
            F.expr("CAST(sum_prior_micro div n_prior AS BIGINT)"),
        ),
    )


# --------------------------------------------------------------------
# 292. right-to-be-forgotten purge audit — the GDPR/CCPA deletion
# pass: a deletion list (here the deterministic predicate
# user_id % 1000 = 7 standing in for the uploaded id file) is
# broadcast and anti-joined against every user-keyed table; the audit
# reports purged/kept counts per table. The anti-join IS the
# production shape (the list arrives as a table, not a predicate);
# broadcast keeps it shuffle-free over the facts at any corpus scale.
@query(
    "rtbf_purge_audit",
    oracle="""
SELECT 'events' AS tbl,
       CAST(SUM(CASE WHEN user_id % 1000 = 7 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purged,
       CAST(SUM(CASE WHEN user_id % 1000 = 7 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_kept
FROM events
UNION ALL
SELECT 'orders' AS tbl,
       CAST(SUM(CASE WHEN o_custkey % 1000 = 7 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey % 1000 = 7 THEN 0 ELSE 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer' AS tbl,
       CAST(SUM(CASE WHEN c_custkey % 1000 = 7 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN c_custkey % 1000 = 7 THEN 0 ELSE 1 END) AS BIGINT)
FROM customer
""",
)
def rtbf_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    # the deletion list as a TABLE (production shape), broadcast
    dele = (
        cust.unionAll(ev)
        .filter(F.col("k") % 1000 == 7)
        .distinct()
        .withColumn("_del", F.lit(1))
    )
    frames = []
    for name, df in (("events", ev), ("orders", orders), ("customer", cust)):
        marked = df.join(F.broadcast(dele), "k", "left")
        frames.append(
            marked.agg(
                F.lit(name).alias("tbl"),
                F.sum(F.when(F.col("_del").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_purged"),
                F.sum(F.when(F.col("_del").isNotNull(), 0).otherwise(1))
                .cast("bigint")
                .alias("n_kept"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# --------------------------------------------------------------------
# 293. PII e-mail redaction — the text-pipeline scrub step: two
# synthetic e-mails are injected around each document (the corpus
# itself is plain ASCII words, so the injection makes the match set
# exact and SQL-reproducible), then a single regex pass redacts them;
# output counts redactions and shas the scrubbed text, proving the
# replacement byte-for-byte. The character-class regex stays in the
# common Java-regex/RE2 dialect subset so both engines match
# identically; pure codegen scan, no shuffle, no Python.
@query(
    "pii_redaction_scrub",
    oracle="""
WITH src AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR) || '@mail.example ' ||
         text || ' escalate to admin' || CAST(doc_id AS VARCHAR) ||
         '@corp.example end' AS raw
  FROM documents)
SELECT doc_id,
       CAST(LENGTH(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+'))
            AS INT) AS n_redacted,
       sha256(regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+',
                             '[EMAIL]', 'g')) AS scrub_sha
FROM src
""",
)
def pii_redaction_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    raw = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example "),
        F.col("text"),
        F.lit(" escalate to admin"),
        F.col("doc_id").cast("string"),
        F.lit("@corp.example end"),
    )
    pat = "[a-z0-9._%+-]+@[a-z0-9.-]+"
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(pat)).cast("int").alias("n_redacted"),
        F.sha2(F.regexp_replace(raw, pat, "[EMAIL]"), 256).alias("scrub_sha"),
    )
