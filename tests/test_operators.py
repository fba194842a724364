"""Operator-level tests with planted cases (dedup families, as-of join,
similarity search) on controlled inputs — the properties the DuckDB
oracle can't check (recall of LSH candidates, stub behavior)."""

import pytest
from pyspark.sql import functions as F

from koalas_spark.operators.asof import asof_join
from koalas_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash64,
    simhash_near_pairs,
    verify_pairs_jaccard,
)
from koalas_spark.operators.similarity import brute_force_topk, lsh_topk

BASE = (
    "spark makes big data simple fast and scalable for analytics "
    "pipelines across many machines with columnar storage and lazy plans"
)


@pytest.fixture(scope="module")
def docs(spark):
    # 0/1 identical; 2 near-dup of 0 (one word changed); 3 unrelated
    rows = [
        (0, BASE),
        (1, BASE),
        (2, BASE.replace("fast", "quick")),
        (3, "completely different content about cooking recipes and baking bread at home with yeast flour water salt and patience"),
    ]
    return rows


def test_exact_dedup_plants(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = exact_dedup(df, "text", "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 2, 3]  # 1 collapses into 0


def test_minhash_lsh_finds_neardup(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", num_perm=64)
    pairs = lsh_candidate_pairs(sigs, bands=16, rows=4)
    verified = verify_pairs_jaccard(pairs, sigs, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (0, 1) in got  # identical docs always pair
    assert (0, 2) in got  # near-dup survives banding + jaccard>=0.5
    assert all(3 not in p for p in got)  # unrelated doc never pairs


def test_simhash_near_pairs(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sims = simhash64(df, "doc_id", "text")
    vals = {r["id"]: r["simhash"] for r in sims.collect()}
    assert vals[0] == vals[1]  # identical text, identical fingerprint
    pairs = simhash_near_pairs(sims, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(0, 1)] == 0
    assert all(3 not in k for k in got)


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 100.0), (1, "2024-01-03 00:00:00", 101.0),
         (2, "2024-01-02 00:00:00", 200.0)],
        "k long, t string, px double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "px")
    trades = spark.createDataFrame(
        [(1, "2024-01-02 12:00:00"), (1, "2024-01-03 00:00:00"),  # equal ts → inclusive
         (2, "2024-01-01 00:00:00"),  # before any quote → null
         (3, "2024-01-05 00:00:00")],  # unknown key → null
        "k long, t string",
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    out = asof_join(
        trades, quotes, left_key="k", right_key="k", left_time="t", right_time="t",
        payload_cols={"px": "px"},
    )
    got = {(r["k"], str(r["t"])): r["px"] for r in out.collect()}
    assert got[(1, "2024-01-02 12:00:00")] == 100.0
    assert got[(1, "2024-01-03 00:00:00")] == 101.0  # <= is inclusive
    assert got[(2, "2024-01-01 00:00:00")] is None
    assert got[(3, "2024-01-05 00:00:00")] is None


def test_ann_topk_and_lsh_recall(spark):
    import math

    # 3 clusters of near-identical vectors on distinct axes
    def vec(axis, eps, dim=8):
        v = [eps * math.sin(i) for i in range(dim)]
        v[axis] += 1.0
        return v

    rows = [(i, vec(i % 3, 0.01 * (i // 3))) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, probes, "vec_id", "embedding", k=3)
    res = {(r["probe_id"], r["rk"]): r["neighbor_id"] for r in exact.collect()}
    # nearest neighbors of probe p are the other vectors on the same axis
    for p in range(3):
        neigh = {res[(p, rk)] for rk in (1, 2, 3)}
        assert neigh == {p + 3, p + 6, p + 9}

    approx = lsh_topk(emb, probes, "vec_id", "embedding", k=3, num_planes=4, dim=8)
    arr = {(r["probe_id"], r["neighbor_id"]) for r in approx.collect()}
    exact_set = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(arr & exact_set) / len(exact_set)
    assert recall >= 0.5  # bucket-local search keeps most true neighbors


def test_multimodal_stub(spark):
    from koalas_spark.operators.multimodal import decode_stub, extract_meta, with_blob

    df = spark.createDataFrame([(1, "hello"), (2, "wörld")], "doc_id long, text string")
    meta = extract_meta(with_blob(df), "doc_id")
    got = {r["doc_id"]: (r["n_bytes"], r["kind"]) for r in meta.collect()}
    assert got[1] == (5, "text/plain")
    assert got[2] == (6, "text/plain")  # ö is 2 UTF-8 bytes
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG")


def test_lang_temperature_resample_downsamples_head(spark):
    """The tail-normalized temperature rates must actually downsample:
    the head language's keep rate is sqrt(c_min/c_head) < 1, so
    n_kept < n_before there, while the smallest language keeps all."""
    from tests.conftest import SF_SMOKE
    from koalas_spark.queries import all_queries

    out = all_queries()["lang_temperature_resample"](spark, SF_SMOKE).collect()
    rows = {r["lang"]: r for r in out}
    head = max(rows.values(), key=lambda r: r["n_before"])
    tail = min(rows.values(), key=lambda r: r["n_before"])
    if head["n_before"] > tail["n_before"]:
        assert head["n_kept"] < head["n_before"]  # head really drops docs
        assert head["thresh"] < 65536
    assert tail["n_kept"] == tail["n_before"]  # smallest language keeps all
    assert tail["thresh"] == 65536


def test_simhash_null_empty_policy(spark):
    """Pin the NULL/empty-doc policy: NULL text and empty/whitespace
    text both fingerprint to simhash 0 and stay in the output — so
    degenerate docs dedup against each other (hamming 0) rather than
    silently disappearing or crashing the Arrow batch."""
    df = spark.createDataFrame(
        [(0, "real document with several words"),
         (1, None),
         (2, ""),
         (3, "   ")],
        "doc_id long, text string",
    )
    sims = simhash64(df, "doc_id", "text")
    vals = {r["id"]: r["simhash"] for r in sims.collect()}
    assert set(vals) == {0, 1, 2, 3}  # nothing dropped
    assert vals[1] == 0 and vals[2] == 0 and vals[3] == 0
    assert vals[0] != 0
    pairs = simhash_near_pairs(sims, max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    # the three degenerate docs pairwise collapse at hamming 0
    for a, b in [(1, 2), (1, 3), (2, 3)]:
        assert got[(a, b)] == 0


def test_pii_scrub_actually_fires(spark):
    """Guard against a dead scrubber (the lang_temperature lesson): the
    planted PII must be found — every source sees nonzero redactions
    overall, and each PII family triggers somewhere."""
    from tests.conftest import SF_SMOKE
    from koalas_spark.queries import all_queries

    out = all_queries()["text_pii_scrub"](spark, SF_SMOKE).collect()
    assert sum(r["n_emails"] for r in out) > 0
    assert sum(r["n_phones"] for r in out) > 0
    assert sum(r["n_ips"] for r in out) > 0


def test_exact_jaccard_prefix_filter_identical(spark):
    """AllPairs prefix filtering must not change the pair set — it is
    a pure candidate-pruning optimization (soundness argument in the
    operator docstring), kept off by default on perf grounds."""
    from koalas_spark.operators.dedup import exact_jaccard_pairs

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.25, 0.5):
        base = {
            (r.src, r.dst)
            for r in exact_jaccard_pairs(d, threshold=t, prefix_filter=False).collect()
        }
        pref = {
            (r.src, r.dst)
            for r in exact_jaccard_pairs(d, threshold=t, prefix_filter=True).collect()
        }
        assert base == pref


def test_containment_pairs_planted_subset(spark):
    """A doc embedded verbatim inside a longer one must surface as
    (contained, container) with 100% containment."""
    from koalas_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta eta theta"
    long_ = "intro words here " + short + " trailing words conclude this document"
    df = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "en"), (3, "totally different text body now", "en")],
        "doc_id long, text string, lang string",
    )
    got = {
        (r.contained_id, r.container_id): r.containment_pct
        for r in containment_pairs(df, pct_threshold=90).collect()
    }
    assert got == {(1, 2): 100}


def test_bpe_learn_merges_degenerate_vocab(spark, tmp_path):
    """A corpus of single-character words has no adjacent symbol pair:
    the merge loop must stop and return the merges learned so far
    (zero here) instead of raising on an empty top-pair frame."""
    from koalas_spark.queries.retrieval import bpe_learn_merges

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, "a b c", "en", "web"), (2, "d e", "en", "web")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = bpe_learn_merges(spark, sf_dir, n_merges=4)
    assert out.count() == 0
    assert out.columns == ["merge_rank", "pair", "freq"]


def test_bpe_oracle_sql_generation():
    """The generated chained-CTE oracle must scale with n and keep
    every CTE materialized (plain CTEs inline 3^n times in DuckDB)."""
    from koalas_spark.queries.retrieval import BPE_MERGES, _bpe_oracle_sql

    sql = _bpe_oracle_sql(5)
    assert sql.count("AS MATERIALIZED") == 2 + 5 + 5 + 4  # w, s1, p_i, m_i, s_2..5
    assert "m5" in sql and "m6" not in sql
    assert _bpe_oracle_sql().count("UNION ALL") == BPE_MERGES - 1


def test_neardup_embedding_block_gate(spark):
    """#41's quadratic stage is size-gated: oversized label blocks must
    reroute to the cell-partitioned (#158) generator, and under-limit
    blocks must keep the exact all-pairs plan (oracle path)."""
    from tests.conftest import SF_SMOKE
    from koalas_spark.queries.dedup import (
        _neardup_embedding_exact,
        neardup_embedding_cells,
        neardup_embedding_gated,
    )
    from koalas_spark.queries.analytics import _t

    # every sf0.001 label block exceeds limit=1 -> celled fallback
    gated = neardup_embedding_gated(spark, SF_SMOKE, block_limit=1)
    celled = neardup_embedding_cells(spark, SF_SMOKE).select(
        "vec_a", "vec_b", "cos_sim"
    )
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, celled.collect())
    )

    # default limit (20k) far above sf0.001 blocks -> exact plan
    exact = _neardup_embedding_exact(_t(spark, SF_SMOKE, "embeddings"))
    deflt = neardup_embedding_gated(spark, SF_SMOKE)
    assert sorted(map(tuple, deflt.collect())) == sorted(
        map(tuple, exact.collect())
    )
    # celled drops cross-cell pairs by design: subset of exact
    e_pairs = {(r["vec_a"], r["vec_b"]) for r in exact.collect()}
    c_pairs = {(r["vec_a"], r["vec_b"]) for r in celled.collect()}
    assert c_pairs <= e_pairs


def test_incremental_neardup_minhash_planted(spark, tmp_path):
    """Catalog doc 0, batch docs 300 (near-dup of 0) and 301
    (unrelated): the incremental probe must match 300 -> 0 with high
    slot agreement and must not match 301."""
    from koalas_spark.queries.dedup import incremental_neardup_minhash

    rows = [
        (0, BASE),
        (300, BASE.replace("fast", "quick")),
        (301, "completely different content about cooking recipes and baking bread at home with yeast flour water salt and patience"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {r.new_id: (r.old_id, r.n_agree) for r in incremental_neardup_minhash(spark, sf_dir).collect()}
    assert 300 in got and got[300][0] == 0 and got[300][1] >= 32
    assert 301 not in got


def test_paragraph_dedup_reassemble_planted(spark, tmp_path):
    """Doc 0 = A+B, doc 1 = A+C (A a full 20-token segment): doc 1
    must drop its copy of A and reassemble to exactly C; doc 0 keeps
    everything."""
    import hashlib

    from koalas_spark.queries.dedup import paragraph_dedup_reassemble

    seg_a = " ".join(f"a{i}" for i in range(20))
    seg_b = " ".join(f"b{i}" for i in range(20))
    seg_c = " ".join(f"c{i}" for i in range(20))
    rows = [(0, f"{seg_a} {seg_b}"), (1, f"{seg_a} {seg_c}")]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {
        r.doc_id: r for r in paragraph_dedup_reassemble(spark, sf_dir).collect()
    }
    assert got[0].n_dropped == 0 and got[0].clean_tokens == 40
    assert got[0].clean_fp == hashlib.md5(f"{seg_a} {seg_b}".encode()).hexdigest()
    assert got[1].n_dropped == 1 and got[1].clean_tokens == 20
    assert got[1].clean_fp == hashlib.md5(seg_c.encode()).hexdigest()


def test_pps_token_sample_planted(spark, tmp_path):
    """Token layout: doc0 [0,500), doc1 [500,2000), doc2 [2000,2300).
    Grid points at 1000 and 2000 both land inside doc1's interval, so
    doc1 is drawn with multiplicity 2 and the others not at all."""
    from koalas_spark.queries.pipeline import pps_token_sample

    rows = [
        (0, " ".join(["w"] * 500)),
        (1, " ".join(["w"] * 1500)),
        (2, " ".join(["w"] * 300)),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = pps_token_sample(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_id, r.tok, r.tok_offset, r.n_hits) == (1, 1500, 500, 2)


def test_fuzzy_match_block_gate(spark):
    """#215's blocking quadratic is size-gated (VERDICT r7 #2): when
    any p_size block exceeds the limit, the key must refine to
    (p_size, first-name-token); refined-key matches are a subset of
    the coarse exact pairs (standard record-linkage recall tradeoff).
    Under the default limit the coarse exact plan (oracle path) runs."""
    from tests.conftest import SF_SMOKE
    from koalas_spark.queries.analytics9 import (
        _fuzzy_pairs,
        fuzzy_match_parts_gated,
    )
    from koalas_spark.queries.analytics import _t

    p = _t(spark, SF_SMOKE, "part").select("p_partkey", "p_name", "p_size")
    coarse = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in _fuzzy_pairs(p, ["p_size"]).collect()
    }

    # every sf0.001 p_size block exceeds limit=1 -> refined-key path
    gated = fuzzy_match_parts_gated(spark, SF_SMOKE, block_limit=1)
    fine = {(r["key_a"], r["key_b"], r["dist"]) for r in gated.collect()}
    assert fine <= coarse
    # refined pairs agree with manually refining the key
    import pyspark.sql.functions as F

    p2 = p.withColumn("blk2", F.split(F.col("p_name"), " ").getItem(0))
    manual = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in _fuzzy_pairs(p2, ["p_size", "blk2"]).collect()
    }
    assert fine == manual

    # default limit far above sf0.001 blocks -> coarse exact plan
    deflt = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in fuzzy_match_parts_gated(spark, SF_SMOKE).collect()
    }
    assert deflt == coarse


def test_mixture_weight_solver_invariants(spark):
    """#466's apportionment contract: weights are integer tenths that
    sum EXACTLY to the budget B = 10 * n_sources, every source gets a
    voice (score floored at 1), and the signal columns stay in their
    documented ranges."""
    from koalas_spark.queries.pipeline import mixture_weight_solver
    from tests.conftest import SF_SMOKE

    rows = mixture_weight_solver(spark, SF_SMOKE).collect()
    n = len(rows)
    assert n >= 2
    assert sum(r["w10"] for r in rows) == 10 * n
    for r in rows:
        assert 0 <= r["qual_ppm"] <= 1_000_000
        assert 0 <= r["uniq_ppm"] <= 1_000_000
        assert r["eff_langs_milli"] >= 1000  # >= 1 effective language
        assert r["score"] >= 1
        assert r["w10"] >= 0


def test_unigram_lm_fertility_vs_bpe_regex(spark):
    """#475's fertility comparison row vs #164 (tokenizer_fertility):
    the trained unigram tokenizer must be a real SUBWORD model —
    fertility (pieces per word) strictly above 1 (not whole words)
    and strictly below the mean word length in chars (better than
    char-splitting) — and its segmentations must reassemble the words
    exactly."""
    from pyspark.sql import functions as F

    from koalas_spark.queries.retrieval import _uni_train
    from tests.conftest import SF_SMOKE

    _, seg = _uni_train(spark, SF_SMOKE)
    row = seg.agg(
        F.sum(F.col("freq") * F.size("pieces")).alias("pieces"),
        F.sum("freq").alias("words"),
        F.sum(F.col("freq") * F.length("word")).alias("chars"),
    ).first()
    fert = row["pieces"] / row["words"]
    char_fert = row["chars"] / row["words"]
    assert 1.0 < fert < char_fert, (fert, char_fert)
    # lossless: pieces concatenate back to the word, in reverse
    # backtrace order (the walk collects suffix-first)
    bad = seg.filter(
        F.concat_ws("", F.reverse("pieces")) != F.col("word")
    ).count()
    assert bad == 0


def test_dsir_sample_invariants(spark):
    """#478 DSIR: the Gumbel-top-k sample is 100 docs, keys strictly
    descending along the emitted order, and the sample is en-enriched
    relative to the corpus (the whole point of importance resampling
    toward an 'en' target)."""
    from koalas_spark.queries.pipeline import dsir_importance_resample
    from tests.conftest import SF_SMOKE

    rows = dsir_importance_resample(spark, SF_SMOKE).collect()
    assert len(rows) == 100
    keys = [r["key_q"] for r in rows]
    assert keys == sorted(keys, reverse=True)
    en_share = sum(1 for r in rows if r["lang"] == "en") / 100
    assert en_share > 193 / 500  # corpus share at sf0.001
    # importance weights of en docs dominate non-en on average
    en_w = [r["logw_nano"] for r in rows if r["lang"] == "en"]
    other_w = [r["logw_nano"] for r in rows if r["lang"] != "en"]
    if en_w and other_w:
        assert sum(en_w) / len(en_w) > sum(other_w) / len(other_w)


def test_jl_projection_norm_unbiasedness(spark):
    """#479 JL: the norm-ratio histogram covers every vector once,
    buckets are consistent, and the projection is UNBIASED — the
    mass-weighted mean ratio sits near 1.0. (Per-vector concentration
    is deliberately weak at 16 projections over structured vectors —
    reporting that honest distortion tail is the audit's job, so the
    test pins the mean, not the spread.)"""
    from koalas_spark.queries.analytics import _t
    from koalas_spark.queries.similarity import jl_projection_norms
    from tests.conftest import SF_SMOKE

    rows = jl_projection_norms(spark, SF_SMOKE).collect()
    n_vecs = _t(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["min_ppm"] <= r["max_ppm"]
        assert r["bucket"] == r["min_ppm"] // 100000
        assert r["bucket"] == r["max_ppm"] // 100000
    # bucket-center mass-weighted mean ~ corpus mean ratio (0.97 at
    # sf0.001); E[ratio] = 1 for Rademacher JL
    mean_ppm = (
        sum((r["bucket"] * 100000 + 50000) * r["n_vecs"] for r in rows)
        / n_vecs
    )
    assert 700_000 < mean_ppm < 1_300_000, mean_ppm
