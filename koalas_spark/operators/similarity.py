"""Similarity search over embedding columns (SURVEY.md §2.4).

brute_force_topk — correctness baseline: broadcast the (small) probe
set against the corpus, exact cosine, per-probe window top-k. The
corpus never shuffles: probes are broadcast, the window partitions by
probe id over |probes|×|corpus| scored rows.

lsh_topk — the scale path: random-hyperplane sign buckets (bits of
xxhash64-seeded pseudo-random weights, so the "random" matrix is
deterministic and shipped as an expression, not driver state). Probes
only score candidates in their own bucket — at 100 TB this turns a
full scan per probe into a bucket-local lookup; recall is tunable by
number of planes / probe multi-probing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from koalas_spark.functions.vectorfn import cosine


def _score(corpus: DataFrame, probes: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    return (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine(F.col("_pvec"), F.col("_cvec")), 6).alias("cos_sim"),
        )
    )


def brute_force_topk(
    corpus: DataFrame, probes: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    scored = _score(corpus, probes, id_col, vec_col)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rk")
    )


def hyperplane_bucket(vec_col, num_planes: int = 8, dim: int = 64):
    """Sign-bucket id from ``num_planes`` deterministic pseudo-random
    hyperplanes. Weight(plane p, dim d) = ±1 from bit0 of
    xxhash64(p, d) — a fixed expression, no driver-side matrix."""
    bucket = None
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(
                    *[
                        F.when(
                            F.xxhash64(F.lit(p), F.lit(d)).bitwiseAND(F.lit(1)) == 1, 1.0
                        ).otherwise(-1.0)
                        for d in range(dim)
                    ]
                ),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: equi-join probe and corpus on bucket id, then
    exact cosine re-rank within the bucket."""
    bucket = hyperplane_bucket(F.col(vec_col), num_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        bucket.alias("_bk"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pvec"),
        bucket.alias("_bk"),
    )
    scored = (
        c.join(F.broadcast(p), "_bk")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(cosine(F.col("_pvec"), F.col("_cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rk")
    )
