"""Skew-mitigation helpers for hot-key joins at scale.

AQE's skew-join splitting (enabled in the session defaults) handles
most runtime skew; ``salted_join`` is the explicit fallback for the
pathological case — a fact table where a handful of keys dominate and
the other side is too big to broadcast.

Mechanics: the skewed (left) side gets a uniform random-ish salt in
[0, salt) derived deterministically from other columns (no rand(), so
retries/speculative tasks stay consistent); the right side is
replicated salt times via explode. The join key becomes (key, salt),
spreading each hot key over ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on column ``on`` with the left
    side salted. Right-side rows are replicated ``salt`` times — use
    only when right is much smaller than left but above the broadcast
    threshold."""
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")
