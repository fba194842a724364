"""Sources & sinks.

Reference parity:
  - ``read_table`` ~ koalas ``Dataframe.fromTable`` (dataframe.d:108):
    delimited text with an explicit, caller-declared schema (the
    reference requires a compile-time struct; we require a DDL/StructType
    — never inferSchema, which double-scans and guesses types).
  - ``write_csv`` ~ koalas ``Dataframe.toCsv`` (dataframe.d:128), but
    distributed: each task writes its partition; header per file.

Parquet is the canonical analytical format: columnar, predicate
pushdown, min/max pruning, splittable — the right scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    sep: str = "\t",
    header: bool = True,
    index_cols: int = 0,
) -> DataFrame:
    """Read a delimited text table with an explicit schema.

    ``index_cols`` mirrors the reference's leading-index-column skip: we
    declare them in the schema as ``_idx0``.. and drop them after the
    scan (column pruning removes them from downstream IO).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if index_cols:
        idx_fields = [
            T.StructField(f"_idx{i}", T.StringType(), True) for i in range(index_cols)
        ]
        schema = T.StructType(idx_fields + list(schema.fields))
    df = spark.read.csv(path, schema=schema, sep=sep, header=header)
    if index_cols:
        df = df.drop(*[f"_idx{i}" for i in range(index_cols)])
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load the benchmark star schema from a scale-factor directory."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def write_csv(
    df: DataFrame, path: str, sep: str = ",", header: bool = True, mode: str = "overwrite"
) -> None:
    """Distributed CSV sink (one file per partition; coalesce upstream
    if a single file is required — never collect to the driver)."""
    df.write.mode(mode).option("header", str(header).lower()).option("sep", sep).csv(path)
