from koalas_spark.sources.io import read_table, read_parquet, load_tables, write_csv

__all__ = ["read_table", "read_parquet", "load_tables", "write_csv"]
