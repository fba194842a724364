"""Multimodal plumbing: frame sampling, feature extraction, and the
ASCII precondition the frame-sample oracle relies on."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_corpus_is_ascii(spark):
    # the multimodal_frame_sample oracle slices DuckDB text by chars
    # and Spark blobs by bytes; equality requires 1 byte per char
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bad = docs.filter(F.octet_length("text") != F.length("text")).count()
    assert bad == 0


def test_frame_sample_matches_python(spark):
    from koalas_spark.operators.multimodal import frame_sample, with_blob

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    out = frame_sample(with_blob(docs), "doc_id", frame_bytes=256, stride=4)
    got = {(r.doc_id, r.frame_no): (r.frame_len, r.frame_sha) for r in out.collect()}
    for row in docs.select("doc_id", "text").collect():
        blob = row.text.encode()
        nf = -(-len(blob) // 256)
        for fno in range(0, nf, 4):
            fr = blob[fno * 256 : fno * 256 + 256]
            assert got[(row.doc_id, fno)] == (len(fr), hashlib.sha256(fr).hexdigest())


def test_byte_histogram_features(spark):
    from koalas_spark.operators.multimodal import byte_histogram_features, with_blob

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    out = byte_histogram_features(with_blob(docs), "doc_id", bins=16)
    got = {r.doc_id: np.array(r.features) for r in out.collect()}
    for row in docs.select("doc_id", "text").collect():
        arr = np.frombuffer(row.text.encode(), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16)[:16] / arr.size
        np.testing.assert_allclose(got[row.doc_id], hist, rtol=0, atol=0)
    # fixed-width vectors, L1-normalized
    assert all(len(v) == 16 and abs(v.sum() - 1.0) < 1e-9 for v in got.values())


def test_decode_stub_raises(spark):
    from koalas_spark.operators.multimodal import decode_stub

    try:
        decode_stub(b"\x89PNG")
        raised = False
    except NotImplementedError:
        raised = True
    assert raised


def test_resize_frames_matches_python(spark):
    from koalas_spark.operators.multimodal import resize_frames, with_blob

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    out = resize_frames(with_blob(docs), "doc_id", src_w=16, target_w=8, target_h=8)
    got = {r.doc_id: (bytes(r.resized), r.width, r.height) for r in out.collect()}
    for row in docs.select("doc_id", "text").collect():
        arr = np.frombuffer(row.text.encode(), dtype=np.uint8)
        src_h = arr.size // 16
        if src_h < 1:
            assert got[row.doc_id] == (arr.tobytes(), None, None)
            continue
        img = arr[: src_h * 16].reshape(src_h, 16)
        ys = (np.arange(8) * src_h) // 8
        xs = (np.arange(8) * 16) // 8
        want = img[np.ix_(ys, xs)].tobytes()
        assert got[row.doc_id] == (want, 8, 8)
    assert len(got) == 50
