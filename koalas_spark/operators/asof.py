"""Distributed as-of join.

Spark has no native as-of join. The naive formulation — inequality
join then argmax per left row — explodes to |L|x|R_key| intermediate
rows. This implementation uses the union-sort technique instead:

  1. union left probes and right quotes into one frame, tagged by side
     (right sorts before left at equal timestamps → inclusive "<=");
  2. hash-partition by key, sort within partition by (time, side);
  3. carry the latest right payload forward with last(ignorenulls)
     over a running window;
  4. keep left rows.

Cost: ONE shuffle on the join key, in-partition sort — the same shape
as a sort-merge join, with no row explosion. This survives 100 TB:
state per partition is a single carried row, and AQE handles skewed
keys by splitting partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: dict[str, str],
    right_order_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` on the same key (direction='backward'),
    or the earliest right row with ``right_time >= left_time``
    (direction='forward') — both inclusive, matching pandas
    merge_asof's allow_exact_matches.

    payload_cols: {right_col: output_alias} — right columns to carry.
    right_order_cols: tie-break among right rows sharing a timestamp
    (backward keeps the max — "latest record"; forward keeps the min —
    "next record" — the symmetric convention).

    Forward is the SAME one-shuffle union-sort plan traversed in
    descending time: at equal timestamps the right side still sorts
    before the left (inclusive bound), and the carried struct becomes
    the nearest following right row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    right_order_cols = right_order_cols or []

    left_cols = left.columns
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        *left_cols,
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in dict.fromkeys(list(payload_cols) + right_order_cols)],
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc()] + [
            F.col(f"_p_{c}").asc_nulls_first() for c in right_order_cols
        ]
    else:
        # descending traversal; last() then carries the right row with
        # the SMALLEST time >= left time, min tie-break on order cols
        order = [F.col("_t").desc(), F.col("_side").asc()] + [
            F.col(f"_p_{c}").desc_nulls_first() for c in right_order_cols
        ]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry the whole right row as ONE struct so the attached payload is
    # always a consistent tuple (per-column last() could mix rows when
    # right columns contain nulls).
    payload_struct = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"_p_{c}").alias(c) for c in payload_cols]),
    )
    carried = F.last(payload_struct, ignorenulls=True).over(w).alias("_carried")
    out_cols = [F.col(f"_carried.{src}").alias(out) for src, out in payload_cols.items()]
    return (
        u.select("*", carried)
        .filter(F.col("_side") == 1)
        .select(*left_cols, *out_cols)
    )
