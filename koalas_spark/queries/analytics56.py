"""Round-10 batch-4 additions (SURVEY.md §2 extensions): Spark 4 SQL
surface — string collations, parameterized IDENTIFIER() queries, the
built-in XML codec, try_* overflow-safe arithmetic, and exact distinct
counting via bitmap aggregates.

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
# 407. case-insensitive grouping via Spark 4 string collations — the
# engine-level answer to "dirty-cased categorical keys" that every
# pipeline otherwise hand-fixes with lower(): a deterministically
# mixed-case brand column (upper when p_partkey is even — simulating
# two ingest sources with different casing conventions) grouped under
# COLLATE UNICODE_CI. The group REPRESENTATIVE under a collation is
# whichever variant the engine sees first (nondeterministic), so the
# output key is LOWER(...) — the counts are what the collation decides.
# Oracle: DuckDB groups by lower() directly (same equivalence classes
# for ASCII brands). At scale, collation-aware grouping happens
# JVM-side inside the same hash aggregate — no extra pass.
@query(
    "collated_group_count",
    oracle="""
WITH m AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_brand) ELSE p_brand END
           AS b,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part)
SELECT LOWER(b) AS brand_ci, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS retail_cents
FROM m GROUP BY LOWER(b) ORDER BY brand_ci
""",
)
def collated_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _t(spark, sf_dir, "part").select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper("p_brand")
        )
        .otherwise(F.col("p_brand"))
        .alias("b"),
        F.floor(F.col("p_retailprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    return (
        m.groupBy(F.expr("b COLLATE UNICODE_CI").alias("bc"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("retail_cents"),
        )
        .select(
            F.lower(F.col("bc").cast("string")).alias("brand_ci"),
            "n_parts",
            "retail_cents",
        )
        .orderBy("brand_ci")
    )


# --------------------------------------------------------------------
# 408. parameterized SQL with IDENTIFIER() — the injection-safe way to
# template a table/column name into SQL (string-concat templating is
# the classic injection vector; IDENTIFIER(:param) resolves through
# the catalog instead). The query itself is a priority rollup over a
# temp view whose NAME arrives as a bind parameter, with the value
# predicate also bound (:yr). Plan-identical to the literal SQL — the
# binder resolves before Catalyst sees the tree.
@query(
    "identifier_param_query",
    oracle="""
SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
         AS BIGINT) AS cents
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1997
GROUP BY o_orderpriority ORDER BY priority
""",
)
def identifier_param_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed view name, createOrReplaceTempView: repeated invocations
    # (any sf_dir) reuse ONE catalog entry instead of accumulating
    # uuid-named views across a session (ADVICE r10). Safe because
    # spark.sql analyzes eagerly — the returned DataFrame captures the
    # view's resolved plan, so a later replace can't retarget it.
    view = "orders_param_identifier_demo"
    _t(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS cents
        FROM IDENTIFIER(:t)
        WHERE EXTRACT(year FROM o_orderdate) = :yr
        GROUP BY o_orderpriority ORDER BY priority
        """,
        args={"t": view, "yr": 1997},
    )


# --------------------------------------------------------------------
# 409. XML interchange round-trip — Spark 4 ships a native XML codec
# (to_xml/from_xml), the remaining interchange format after the
# JSONL/CSV/ORC round-trips (#224/#255/#262): serialize each order row
# to an XML fragment, parse it back with an explicit schema, and
# aggregate the PARSED rows. Byte-preservation is proven by the
# result equaling the direct aggregation (the oracle); doubles ride
# cents so the text round-trip is integer-exact. The codec runs
# JVM-side per row inside codegen — no Python, no extra shuffle.
@query(
    "xml_roundtrip_stats",
    oracle="""
SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
         AS BIGINT) AS cents,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders GROUP BY o_orderpriority ORDER BY priority
""",
)
def xml_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    xml = o.select(
        F.to_xml(
            F.struct("o_orderkey", "o_orderpriority", "cents")
        ).alias("x")
    )
    back = xml.select(
        F.from_xml(
            "x", "o_orderkey BIGINT, o_orderpriority STRING, cents BIGINT"
        ).alias("s")
    ).select("s.*")
    return (
        back.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------
# 410. try_* overflow-safe arithmetic audit — the int64-headroom
# discipline (SCALING.md r9/r10 audits) turned into a runtime check:
# try_multiply returns NULL instead of wrapping/throwing, so counting
# its NULLs against the DECIMAL(38) overflow PREDICTION (cents *
# factor > int64 max) must agree exactly. A pipeline at 100 TB wants
# exactly this shape as a canary aggregate: zero-cost detection of
# the first corpus size where a product leaves int64. factor 2e12
# splits the real price distribution (~$46k boundary). The oracle
# (no try_multiply in DuckDB) computes both counts from the same
# DEC38 predicate — Spark's try-NULL count proving the engine agrees
# with the prediction is the point of the audit.
@query(
    "try_arithmetic_overflow_audit",
    oracle="""
WITH b AS (
  SELECT l_linestatus AS status,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN CAST(cents AS DECIMAL(38,0)) * 2000000000000
                          > 9223372036854775807 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_overflow_try,
       CAST(SUM(CASE WHEN CAST(cents AS DECIMAL(38,0)) * 2000000000000
                          > 9223372036854775807 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_overflow_pred
FROM b GROUP BY status ORDER BY status
""",
)
def try_arithmetic_overflow_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from koalas_spark.queries.analytics import _spread

    # _spread: the per-row DECIMAL(38) cross-check is the compute wall
    # here, and the single-row-group scan would run it on one core
    # (guide §2.6; measured 7.7s -> sub-second at sf0.1 on local[32])
    b = _spread(
        _t(spark, sf_dir, "lineitem").select("l_linestatus", "l_extendedprice")
    ).select(
        F.col("l_linestatus").alias("status"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    return (
        b.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            # bounds-gated try arithmetic: try_multiply detects
            # overflow by catching ArithmeticException PER ROW, and on
            # this corpus a third of the rows overflow — measured 3.0s
            # of pure exception unwinding at sf0.1 (exceptions are for
            # the exceptional). |cents| > 4611686 is exactly
            # Long.MAX/2e12 < cents or cents*2e12 < Long.MIN, so the
            # WHEN arm answers the overflowing rows up front and
            # try_multiply still runs on every non-overflowing row
            # (where it cannot throw) — same per-row try-arithmetic
            # semantics, no exception storm, identical counts.
            F.sum(
                F.when(F.abs(F.col("cents")) > 4611686, 1)
                .when(
                    F.expr("try_multiply(cents, 2000000000000L)").isNull(), 1
                )
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_overflow_try"),
            F.sum(
                F.expr(
                    "CASE WHEN CAST(cents AS DECIMAL(38,0)) * 2000000000000"
                    " > 9223372036854775807 THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_overflow_pred"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------
# 411. exact distinct users via bitmap aggregates — the OLAP-standard
# EXACT alternative to HLL (#123) and approx_count_distinct (#36):
# user ids bucket into 32k-bit bitmaps (bitmap_bucket_number /
# bitmap_bit_position), per-bucket bitmaps OR-merge map-side
# (bitmap_construct_agg), and bitmap_count sums the bits. Two
# map-side-combined aggregates whose intermediate state is bitmaps,
# not id sets — the shuffle carries |buckets| x 4 KB regardless of
# row count, which is why engines ship this for 100 TB distincts.
# Oracle: plain COUNT(DISTINCT).
@query(
    "bitmap_distinct_users",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_type", "user_id")
    per_bucket = e.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_users")
        )
        .orderBy("event_type")
    )
