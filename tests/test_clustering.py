"""Distributed quantized-grid Lloyd k-means vs an independent numpy
implementation: identical assignments and distances, NO tolerance —
the operator's integer arithmetic is order-independent by design, so
any mismatch is a bug, not float weather."""

import numpy as np

from tests.conftest import SF_SMOKE


def _half_up_div(s: int, n: int) -> int:
    sign = -1 if s < 0 else 1
    return sign * ((2 * abs(s) + n) // (2 * n))


def test_kmeans_matches_numpy(spark):
    from koalas_spark.operators.clustering import QUANT, kmeans_lloyd

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    k, iters = 4, 3
    got = {
        r.id: (r.cluster, r.qdist)
        for r in kmeans_lloyd(emb, "vec_id", "embedding", k=k, iters=iters).collect()
    }

    rows = sorted(
        (
            (r.vec_id, np.floor(np.array(r.embedding, dtype=np.float64) * QUANT + 0.5).astype(np.int64))
            for r in emb.collect()
        ),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    C = X[:k].copy()

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d.min(axis=1)

    for _ in range(iters):
        a, _ = assign(C)
        for c in range(k):
            members = X[a == c]
            if len(members):
                s = members.sum(axis=0)
                C[c] = [_half_up_div(int(sv), len(members)) for sv in s]
    a, d = assign(C)
    for i, vid in enumerate(ids):
        assert got[vid] == (a[i], d[i]), f"vec {vid}: {got[vid]} != {(a[i], d[i])}"


def test_kmeans_objective_decreases(spark):
    from koalas_spark.operators.clustering import kmeans_lloyd

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    o1 = kmeans_lloyd(emb, "vec_id", "embedding", k=4, iters=1)
    o3 = kmeans_lloyd(emb, "vec_id", "embedding", k=4, iters=4)
    from pyspark.sql import functions as F

    s1 = o1.agg(F.sum("qdist")).first()[0]
    s3 = o3.agg(F.sum("qdist")).first()[0]
    # grid re-quantization of each centroid can cost up to half a step
    # per component, so allow a hair of slack on strict monotonicity
    assert s3 <= s1 * 1.01


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """Two identical init vectors: in iteration 1 the duplicate
    centroid (higher cluster id) wins nothing (ties break low), so its
    cluster is EMPTY — the update must keep its previous centroid
    rather than KeyError or silently collapse to k-1 clusters. The
    kept [0,0] centroid then legitimately wins back the exact-zero
    points once centroid 0 drifts toward its cluster mean, so the
    deterministic fixpoint is {0,1} | {4} | {2,3} with all three
    clusters in use."""
    from koalas_spark.operators.clustering import kmeans_lloyd

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),      # duplicate of init centroid 0
        (2, [1.0, 1.0]),
        (3, [1.01, 1.01]),
        (4, [0.02, 0.01]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r.cluster for r in kmeans_lloyd(df, "vec_id", "embedding", k=3, iters=3).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0] == out[1]            # exact-zero pair stays together
    assert out[2] == out[3]            # far pair stays together
    assert len({out[0], out[2], out[4]}) == 3  # no cluster collapse


def test_kmeans_core_memo_matches_fresh_build(spark):
    """The session-shared Lloyd training core (r13) must be
    value-identical to a fresh run (rebuild=True bypasses it), for
    both consumers' final passes (plain and second=True)."""
    from koalas_spark.operators.clustering import kmeans_finish
    from koalas_spark.queries.similarity import kmeans_embeddings_core

    sf = SF_SMOKE
    base_c, cent_c = kmeans_embeddings_core(spark, sf)
    base_f, cent_f = kmeans_embeddings_core(spark, sf, rebuild=True)
    assert cent_c == cent_f
    for second in (False, True):
        rows_c = sorted(
            map(tuple, kmeans_finish(base_c, cent_c, second).collect())
        )
        rows_f = sorted(
            map(tuple, kmeans_finish(base_f, cent_f, second).collect())
        )
        assert rows_c == rows_f
    # and the memo actually memoizes
    assert (
        kmeans_embeddings_core(spark, sf)[0]
        is kmeans_embeddings_core(spark, sf)[0]
    )
