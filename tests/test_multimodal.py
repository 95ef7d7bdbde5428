from __future__ import annotations

import hashlib

import pytest

from bigdataamazon_spark.catalog import load_table
from bigdataamazon_spark.operators import multimodal


def test_fake_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    blobs = multimodal.with_synthetic_blob(docs, "doc_id", "text")
    out = multimodal.decode_blobs(blobs, decode_mode="fake")
    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert len(rows) == 5
    for doc_id, r in rows.items():
        digest = hashlib.md5(src[doc_id].encode()).digest()
        assert r.n_bytes == 16
        assert r.width == 16 + digest[0] % 64
        assert r.height == 16 + digest[1] % 64
        assert r.n_channels == 1 + digest[2] % 4
        assert len(r.feature) == multimodal.FEATURE_DIM
        assert abs(r.feature[0] - digest[0] / 255.0) < 1e-6


def test_real_decode_is_explicit_seam(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    blobs = multimodal.with_synthetic_blob(docs, "doc_id", "text")
    out = multimodal.decode_blobs(blobs, decode_mode="real")
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_bad_mode_rejected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    blobs = multimodal.with_synthetic_blob(docs, "doc_id", "text")
    with pytest.raises(ValueError):
        multimodal.decode_blobs(blobs, decode_mode="png")
