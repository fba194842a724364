

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
