"""Distributed Lloyd k-means vs an independent numpy implementation:
identical assignments and distances (same init, same tie-breaks)."""

import numpy as np

from tests.conftest import SF_SMOKE


def test_kmeans_matches_numpy(spark):
    from koalas_spark.operators.clustering import kmeans_lloyd

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    k, iters = 4, 3
    got = {
        r.id: (r.cluster, r.sq_dist)
        for r in kmeans_lloyd(emb, "vec_id", "embedding", k=k, iters=iters).collect()
    }

    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    mism = 0
    for i, vid in enumerate(ids):
        cl, sd = got[vid]
        if cl != a[i]:
            mism += 1
        else:
            assert abs(sd - round(d[i, a[i]], 6)) < 1e-4
    # boundary points can flip under float reassociation; require
    # essentially-identical clusterings
    assert mism <= len(ids) * 0.01, f"{mism}/{len(ids)} assignments differ"


def test_kmeans_objective_decreases(spark):
    from koalas_spark.operators.clustering import kmeans_lloyd

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    o1 = kmeans_lloyd(emb, "vec_id", "embedding", k=4, iters=1)
    o3 = kmeans_lloyd(emb, "vec_id", "embedding", k=4, iters=4)
    from pyspark.sql import functions as F

    s1 = o1.agg(F.sum("sq_dist")).first()[0]
    s3 = o3.agg(F.sum("sq_dist")).first()[0]
    assert s3 <= s1 + 1e-9
