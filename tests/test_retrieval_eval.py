

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


def test_uni_train_memo_matches_fresh_build(spark):
    """The session-shared unigram-LM training prefix (r13) must be
    value-identical to a fresh run (rebuild=True bypasses it), for
    both the train and the apply (final_segment) consumers."""
    from koalas_spark.queries.retrieval import _uni_train

    sf = "/root/testdata/sf0.001"
    fin_c, seg_c = _uni_train(spark, sf, final_segment=True)
    fin_f, seg_f = _uni_train(spark, sf, final_segment=True, rebuild=True)
    assert sorted(map(tuple, fin_c.collect())) == sorted(
        map(tuple, fin_f.collect())
    )
    key = lambda r: r["word"]
    sc = {r["word"]: (r["freq"], list(r["pieces"])) for r in seg_c.collect()}
    sfr = {r["word"]: (r["freq"], list(r["pieces"])) for r in seg_f.collect()}
    assert sc == sfr


def test_minhash_artifact_matches_fresh_build(spark):
    """The session-shared (shingles, signatures) memo (r13) must be
    value-identical to a fresh build (rebuild=True bypasses it)."""
    from koalas_spark.queries.dedup import minhash_sig_table

    sf = "/root/testdata/sf0.001"
    b_c, s_c = minhash_sig_table(spark, sf)
    b_f, s_f = minhash_sig_table(spark, sf, rebuild=True)
    kb = lambda rows: sorted((r["id"], tuple(r["shingles"])) for r in rows)
    ks = lambda rows: sorted((r["id"], tuple(r["sig"])) for r in rows)
    assert kb(b_c.collect()) == kb(b_f.collect())
    assert ks(s_c.collect()) == ks(s_f.collect())
