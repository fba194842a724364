"""Multi-dimensional data layout: Z-order (Morton) clustering for
parquet writes.

A linear sort clusters row groups on ONE dimension — a range predicate
on any other column overlaps every file and min/max pruning does
nothing. Interleaving the bits of several normalized dimensions into
one Morton key and range-partition-sorting on it gives every file a
tight bounding box in ALL participating dimensions, so a
multi-dimensional box predicate skips most row groups at scan time
(the same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER BY).

Everything is JVM-side codegen: min/max normalization statistics are
attached with a broadcast cross-join of a 1-row aggregate (no driver
collect), and the bit interleave is a fixed fold of shift/and/or
expressions. The write is `repartitionByRange` on the Morton key —
a sampled range exchange, the same mechanism as a global sort, so at
100 TB it scales exactly like `ORDER BY` — followed by
`sortWithinPartitions` so row groups inside each file are clustered
too.

Reference parity: the reference's layout control is its sort
(`dataframe.d:177 sort` + `index.d:24 multiSort`) — single-dimension
only; Z-order is the multi-dimension generalization a columnar store
needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 12) -> Column:
    """Morton key: bit-interleave already-normalized non-negative ints
    (each in [0, 2**bits)) into one long. Dimension j contributes bit
    i to output position i*len(cols)+j."""
    n = len(cols)
    assert n * bits <= 63, "Morton key must fit a signed long"
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Attach a `_zorder` Morton-key column over `cols` (numeric).

    Columns are min/max normalized to [0, 2**bits) with a broadcast
    1-row statistics aggregate; NULLs map to 0 (sort first)."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    )
    d = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    scaled = [
        F.coalesce(
            F.floor(
                (F.col(c).cast("double") - F.col(f"_mn_{c}"))
                * top
                / F.greatest(F.col(f"_mx_{c}") - F.col(f"_mn_{c}"), F.lit(1.0))
            ),
            F.lit(0),
        )
        for c in cols
    ]
    return d.withColumn("_zorder", interleave_bits(scaled, bits)).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 12,
    num_files: int | None = None,
) -> None:
    """Write `df` to parquet clustered on the Z-order of `cols`."""
    z = zorder_key(df, cols, bits)
    if num_files:
        z = z.repartitionByRange(num_files, "_zorder")
    else:
        z = z.repartitionByRange("_zorder")
    z.sortWithinPartitions("_zorder").drop("_zorder").write.mode(
        "overwrite"
    ).parquet(path)
