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


@pytest.mark.skipif(
    multimodal.HAS_PIL, reason="pillow present: real path decodes instead of raising"
)
def test_real_decode_is_explicit_seam(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    blobs = multimodal.with_synthetic_blob(docs, "doc_id", "text")
    out = multimodal.decode_blobs(blobs, decode_mode="real")
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


@pytest.mark.skipif(not multimodal.HAS_PIL, reason="pillow not importable")
def test_real_decode_with_pil(spark):
    """Real kernel path: decode an actual PNG, check dims/channels and
    the per-channel mean feature."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (10, 6), (255, 0, 0)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, blob binary")
    rows = multimodal.decode_blobs(df, decode_mode="real").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.n_channels) == (10, 6, 3)
    assert abs(r.feature[0] - 1.0) < 1e-6 and abs(r.feature[1]) < 1e-6

    resized = multimodal.resize_images(df, 4, 3, decode_mode="real").collect()
    assert (resized[0].width, resized[0].height) == (4, 3)
    out = Image.open(io.BytesIO(bytes(resized[0].blob)))
    assert out.size == (4, 3)


def test_bad_mode_rejected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    blobs = multimodal.with_synthetic_blob(docs, "doc_id", "text")
    with pytest.raises(ValueError):
        multimodal.decode_blobs(blobs, decode_mode="png")


def test_resize_keeps_binary_payload(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    blobs = multimodal.with_synthetic_blob(docs, "doc_id", "text")
    out = multimodal.resize_images(blobs, 32, 24)
    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: bytes(r.blob) for r in blobs.collect()}
    assert len(rows) == 5
    for doc_id, r in rows.items():
        assert (r.width, r.height) == (32, 24)
        expect = hashlib.md5(src[doc_id] + b":32x24").digest()
        assert bytes(r.blob) == expect

    if not multimodal.HAS_PIL:
        with pytest.raises(Exception):
            multimodal.resize_images(blobs, 32, 24, decode_mode="real").collect()


def test_frame_sampling_fans_out(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(8)
    blobs = multimodal.with_synthetic_blob(docs, "doc_id", "text")
    out = multimodal.sample_frames(blobs).collect()
    src = {r.doc_id: bytes(r.blob) for r in blobs.collect()}
    # per-doc fan-out matches the deterministic frame count; frame
    # payloads are the digest chain
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(src)
    for doc_id, frames in by_doc.items():
        b = src[doc_id]
        assert len(frames) == 1 + b[3] % 4
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))
        for f in frames:
            expect = hashlib.md5(f"{b.hex()}:{f.frame_idx}".encode()).digest()
            assert bytes(f.frame) == expect


def test_synthetic_wav_is_a_real_riff_container(spark):
    """The audio path produces genuine WAV files the stdlib decoder
    accepts: RIFF magic, declared params, payload length — and the
    features derive from an actual parse, not the raw blob."""
    import io
    import wave as wave_mod

    from bigdataamazon_spark.operators import multimodal

    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    rows = multimodal.with_synthetic_wav(docs).collect()
    assert len(rows) == 2
    for r in rows:
        blob = bytes(r["wav"])
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        with wave_mod.open(io.BytesIO(blob), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 1
            assert w.getframerate() == multimodal.AUDIO_SR
            assert w.getnframes() == multimodal.AUDIO_BLOCKS * 16
    feats = {
        r["doc_id"]: r
        for r in multimodal.audio_features(
            multimodal.with_synthetic_wav(docs)
        ).collect()
    }
    import hashlib

    import numpy as np

    pcm = np.frombuffer(
        b"".join(
            hashlib.md5(f"wav:1:{blk}".encode()).digest()
            for blk in range(multimodal.AUDIO_BLOCKS)
        ),
        dtype=np.uint8,
    )
    x = pcm.astype(np.int64) - 128
    assert feats[1]["n_zero_cross"] == int((x[:-1] * x[1:] < 0).sum())
    assert abs(feats[1]["rms"] - float(np.sqrt(np.mean(x.astype(float) ** 2)))) < 1e-9
