

def test_bm25_artifact_matches_fresh_build(spark):
    """The session-shared BM25 (tf, scored) memo (r13) must be
    value-identical to a fresh build (rebuild=True bypasses it) —
    the copurchase_pair_table parity discipline."""
    from koalas_spark.queries.retrieval import _bm25_parts

    sf = "/root/testdata/sf0.001"
    tf_c, sc_c = _bm25_parts(spark, sf)
    tf_f, sc_f = _bm25_parts(spark, sf, rebuild=True)
    assert sorted(map(tuple, tf_c.collect())) == sorted(
        map(tuple, tf_f.collect())
    )
    assert sorted(map(tuple, sc_c.collect())) == sorted(
        map(tuple, sc_f.collect())
    )
    # and the memo actually memoizes
    assert _bm25_parts(spark, sf)[1] is _bm25_parts(spark, sf)[1]
