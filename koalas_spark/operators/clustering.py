"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The 100 TB shape: centroids are tiny (k × dim doubles) and live on the
driver between iterations; each iteration is ONE map-side pass over
the corpus (assign to nearest centroid via a broadcast literal array)
plus ONE partial-aggregated shuffle of k rows per partition (sum/count
per cluster). No corpus self-joins, no driver collect of vectors —
the only thing that ever crosses to the driver is the k×dim centroid
matrix. Iterations are deterministic (fixed init = first k vec_ids,
index-order double arithmetic), so results are reproducible across
cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec_col, centroid: list[float]):
    """Squared L2 distance between an array<double/float> column and a
    literal centroid — codegen'd zip_with + aggregate, no UDF."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(vec_col, lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
) -> DataFrame:
    """Run `iters` Lloyd iterations; returns (id, cluster, sq_dist).

    Init: the k lowest-id vectors (deterministic). Empty clusters keep
    their previous centroid."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    centroids = [
        [float(x) for x in r.v]
        for r in base.orderBy("id").limit(k).collect()
    ]

    def assign(frame: DataFrame) -> DataFrame:
        dists = F.array(*[_sq_dist(F.col("v"), c) for c in centroids])
        # array_position of the min = nearest centroid, 1-based; ties
        # break to the lowest cluster id on both recomputes
        best = F.array_position(dists, F.array_min(dists)).cast("int") - 1
        return frame.withColumn("cluster", best).withColumn(
            "sq_dist", F.array_min(dists)
        )

    for _ in range(iters):
        assigned = assign(base)
        dim = len(centroids[0])
        sums = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at(F.col("v"), i + 1).cast("double")).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new = {
            r["cluster"]: [r[f"s{i}"] / r["n"] for i in range(dim)]
            for r in sums.collect()
        }
        centroids = [new.get(c, centroids[c]) for c in range(k)]

    return assign(base).select(
        "id", "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )
