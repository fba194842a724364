"""Vector math over array<float>/array<double> columns.

All expressions fold sequentially in index order with double
accumulation, so results are bit-identical to any engine that does a
plain sequential loop (DuckDB's list_dot_product) — which makes them
oracle-checkable. JVM-side codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _asd(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_asd(a), _asd(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / sqrt(|a|^2 * |b|^2) — the same formula shape DuckDB's
    list_cosine_similarity uses (single sqrt of the product)."""
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))
