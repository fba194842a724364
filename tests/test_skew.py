"""salted_join: identical results to a plain join, with the left
side's hot keys spread over `salt` reducers."""

from pyspark.sql import functions as F


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain(spark):
    from koalas_spark.operators.skew import salted_join

    # skewed left: one hot key dominating
    left = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("rval")
    )
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = sorted(plain.columns)
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_left_outer(spark):
    from koalas_spark.operators.skew import salted_join

    left = spark.range(0, 1000).select((F.col("id") % 7).alias("k"), F.col("id").alias("lval"))
    right = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", salt=4, how="left")
    cols = sorted(plain.columns)
    assert _rows(salted, cols) == _rows(plain, cols)
