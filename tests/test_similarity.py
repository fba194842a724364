

"""IVF recall property: probing every cell is exhaustive search."""

from tests.conftest import SF_SMOKE


def test_ivf_nprobe_all_cells_equals_bruteforce(spark):
    from pyspark.sql import functions as F

    from koalas_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") < 16)
    probes = emb.filter(F.col("vec_id") < 5)
    ivf_all = ivf_topk(emb, probes, centroids, "vec_id", "embedding", k=5, nprobe=16)
    bf = brute_force_topk(emb, probes, "vec_id", "embedding", k=5)
    a = sorted(map(tuple, ivf_all.collect()))
    b = sorted(map(tuple, bf.collect()))
    assert a == b and a


def test_int8_quantized_topk_recall(spark):
    """int8 quantization must barely perturb the ranking: recall@5 of
    the quantized top-k vs the exact brute force should be high, and
    quantized scores must be integers reproducible from numpy."""
    import numpy as np
    from pyspark.sql import functions as F

    from koalas_spark.operators.similarity import (
        brute_force_topk,
        int8_brute_force_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, probes, "vec_id", "embedding", k=5)
    quant = int8_brute_force_topk(emb, probes, "vec_id", "embedding", k=5)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.probe_id, set()).add(r.neighbor_id)
    qt = {}
    qrows = quant.collect()
    for r in qrows:
        qt.setdefault(r.probe_id, set()).add(r.neighbor_id)
    recalls = [len(ex[p] & qt[p]) / len(ex[p]) for p in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    # spot-check the integer dot against an independent numpy quantize
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}

    def q(v):
        amax = np.abs(v).max()
        if amax == 0:
            return np.zeros_like(v, dtype=np.int64)
        return np.floor(v * 127.0 / amax + 0.5).astype(np.int64)

    for r in qrows[:10]:
        want = int(q(vecs[r.probe_id]) @ q(vecs[r.neighbor_id]))
        assert r.qdot == want


def test_pq_topk_recall_vs_exact(spark):
    """PQ with per-axis codebooks must keep most true neighbors for
    clustered vectors (same-axis cluster members share codes)."""
    import math

    from pyspark.sql import functions as F

    from koalas_spark.operators.similarity import brute_force_topk, pq_topk

    def vec(axis, eps, dim=64):
        v = [eps * math.sin(i + 1) for i in range(dim)]
        v[axis * 7] += 1.0
        return v

    rows = [(i, vec(i % 3, 0.01 * (i // 3))) for i in range(18)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.filter(F.col("vec_id") < 3)
    codebook = emb.filter(F.col("vec_id") < 16)
    exact = brute_force_topk(emb, probes, "vec_id", "embedding", k=3)
    approx = pq_topk(emb, probes, codebook, "vec_id", "embedding", k=3)
    exact_set = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["probe_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5
