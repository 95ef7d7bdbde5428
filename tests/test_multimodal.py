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


# ---------------------------------------------------------------------------
# PNG: the REAL stdlib image codec (r08)
# ---------------------------------------------------------------------------


def test_png_codec_roundtrip():
    """encode_png -> decode_png is the identity on pixels, for gray and
    RGB, and the blob is a spec-shaped container (signature, IEND)."""
    import numpy as np

    rng = np.random.default_rng(5)
    for ch in (1, 3):
        w, h = 11, 6
        img = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
        blob = multimodal.encode_png(
            [bytes(bytearray(r)) for r in img], w, h, n_channels=ch
        )
        assert blob[:8] == multimodal.PNG_SIG and blob.endswith(
            multimodal._png_chunk(b"IEND", b"")
        )
        dw, dh, dch, px = multimodal.decode_png(blob)
        assert (dw, dh, dch) == (w, h, ch)
        assert np.array_equal(px, img)


def test_png_decoder_unfilters_all_types():
    """The decoder must undo every spec filter (Sub/Up/Average/Paeth),
    not just the filter-0 lines our encoder emits — verified against an
    independent forward-filter implementation."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(3)
    W, H, CH = 13, 7, 3
    img = rng.integers(0, 256, size=(H, W * CH), dtype=np.uint8).astype(np.int64)

    def forward_filter(ft, cur, prev, ch):
        out = bytearray()
        for i in range(len(cur)):
            a = cur[i - ch] if i >= ch else 0
            up = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (a + up) // 2
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
            out.append((cur[i] - pred) & 0xFF)
        return bytes(out)

    raw = b""
    prev = np.zeros(W * CH, dtype=np.int64)
    for r, ft in enumerate([1, 2, 3, 4, 0, 1, 4]):
        line = (
            bytes(img[r].astype(np.uint8))
            if ft == 0
            else forward_filter(ft, img[r], prev, CH)
        )
        raw += bytes([ft]) + line
        prev = img[r]
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    blob = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw))
        + multimodal._png_chunk(b"IEND", b"")
    )
    w, h, ch, px = multimodal.decode_png(blob)
    assert (w, h, ch) == (W, H, CH)
    import numpy as np  # noqa: F811

    assert np.array_equal(px.astype(np.int64), img)


def test_png_decoder_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_png(b"not a png at all")
    with pytest.raises(ValueError, match="unsupported|IHDR"):
        # truncated: signature only
        multimodal.decode_png(multimodal.PNG_SIG)


def test_synthetic_png_real_container_and_replayable_pixels(spark, sf_dir):
    """with_synthetic_png emits genuine PNGs whose decoded scanlines are
    exactly the md5 digest chain — the property the DuckDB oracles rely
    on — with dims in the documented 16..31 x 8..15 envelope."""
    docs = load_table(spark, sf_dir, "documents").limit(4)
    rows = multimodal.with_synthetic_png(docs).collect()
    assert len(rows) == 4
    for r in rows:
        blob = bytes(r.png)
        w, h, ch, px = multimodal.decode_png(blob)
        assert ch == 1 and 16 <= w <= 31 and 8 <= h <= 15
        assert (w, h) == multimodal._png_dims(r.doc_id)
        for rr in range(h):
            assert bytes(px[rr]) == multimodal._png_scanline(r.doc_id, rr, w)


def test_png_features_match_direct_computation(spark, sf_dir):
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(3)
    png = multimodal.with_synthetic_png(docs)
    feats = {r.doc_id: r for r in multimodal.png_features(png).collect()}
    for doc_id, r in feats.items():
        w, h = multimodal._png_dims(doc_id)
        v = np.array(
            [list(multimodal._png_scanline(doc_id, rr, w)) for rr in range(h)],
            dtype=np.int64,
        )
        n = w * h
        assert (r.width, r.height, r.n_pixels, r.n_channels) == (w, h, n, 1)
        assert r.mean_lum == v.sum() / n
        mean = v.sum() / n
        assert abs(r.std_lum - np.sqrt(int((v * v).sum()) / n - mean * mean)) < 1e-12
        assert r.n_edges == int((np.abs(np.diff(v, axis=1)) >= 32).sum())
        bands = np.arange(h) % multimodal.PNG_FEATURE_BANDS
        assert list(r.band_sums) == [
            int(v[bands == j].sum()) for j in range(multimodal.PNG_FEATURE_BANDS)
        ]


def test_png_resize_runs_real_without_pil(spark, sf_dir):
    """PNG inputs resize through the stdlib codec in ANY container —
    decode, nearest-neighbor sample, re-encode — so decode_mode='real'
    no longer needs PIL for the engine's own image format."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(3)
    png = multimodal.with_synthetic_png(docs).withColumnRenamed("png", "blob")
    out = {r.doc_id: r for r in
           multimodal.resize_images(png, 8, 5, decode_mode="real").collect()}
    assert len(out) == 3
    for doc_id, r in out.items():
        w, h, ch, px = multimodal.decode_png(bytes(r.blob))
        assert (w, h, ch) == (8, 5, 1)
        sw, sh = multimodal._png_dims(doc_id)
        src = np.array(
            [list(multimodal._png_scanline(doc_id, rr, sw)) for rr in range(sh)],
            dtype=np.uint8,
        )
        ri = (np.arange(5) * sh) // 5
        ci = (np.arange(8) * sw) // 8
        assert np.array_equal(px, src[ri][:, ci])


def test_decode_blobs_real_mode_handles_png_without_pil(spark, sf_dir):
    """decode_blobs(decode_mode='real') routes PNG inputs through the
    stdlib codec, so the real path works in ANY container for the
    engine's own image format; non-PNG blobs still need PIL."""
    docs = load_table(spark, sf_dir, "documents").limit(3)
    png = multimodal.with_synthetic_png(docs).withColumnRenamed("png", "blob")
    rows = {r.doc_id: r for r in
            multimodal.decode_blobs(png, decode_mode="real").collect()}
    assert len(rows) == 3
    for doc_id, r in rows.items():
        w, h = multimodal._png_dims(doc_id)
        assert (r.width, r.height, r.n_channels) == (w, h, 1)
        import numpy as np

        v = np.array(
            [list(multimodal._png_scanline(doc_id, rr, w)) for rr in range(h)],
            dtype=np.float64,
        )
        assert abs(r.feature[0] - v.mean() / 255.0) < 1e-6


# ---------------------------------------------------------------------------
# AVI: the REAL stdlib video container codec (r08)
# ---------------------------------------------------------------------------


def test_avi_codec_roundtrip():
    """encode_avi_rgb -> decode_avi is the identity on frames (the
    bottom-up/BGR DIB scramble is applied and undone), and the blob is
    a spec-shaped RIFF container."""
    import numpy as np

    rng = np.random.default_rng(9)
    w, h = 8, 6
    frames = [rng.integers(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
              for _ in range(3)]
    blob = multimodal.encode_avi_rgb(frames, w, h)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    dw, dh, dec = multimodal.decode_avi(blob)
    assert (dw, dh, len(dec)) == (w, h, 3)
    for src, d in zip(frames, dec):
        assert d.tobytes() == src
    # the container layout really is scrambled: raw '00db' payload of
    # frame 0 differs from generation order unless the image is
    # flip/swap-symmetric (vanishingly unlikely for random bytes)
    assert frames[0] not in blob or frames[0] == frames[0][::-1]


def test_avi_decoder_rejects_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_avi(b"not a riff container")
    frames = [multimodal._avi_frame_payload(1, 0)]
    blob = multimodal.encode_avi_rgb(frames, multimodal.AVI_W, multimodal.AVI_H)
    with _pytest.raises(ValueError):
        multimodal.decode_avi(blob[:60])


def test_synthetic_avi_real_container_and_replayable_pixels(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(4)
    rows = multimodal.with_synthetic_avi(docs).collect()
    assert len(rows) == 4
    for r in rows:
        blob = bytes(r.avi)
        w, h, frames = multimodal.decode_avi(blob)
        assert (w, h) == (multimodal.AVI_W, multimodal.AVI_H)
        assert len(frames) == multimodal._avi_n_frames(r.doc_id)
        for f, fr in enumerate(frames):
            assert fr.tobytes() == multimodal._avi_frame_payload(r.doc_id, f)


def test_sample_frames_real_mode_demuxes_avi_without_pyav(spark, sf_dir):
    """sample_frames(decode_mode='real') routes uncompressed AVI
    through the stdlib RIFF walker — real video demux in ANY
    container; non-AVI blobs still need PyAV."""
    docs = load_table(spark, sf_dir, "documents").limit(3)
    avi = multimodal.with_synthetic_avi(docs).withColumnRenamed("avi", "blob")
    out = multimodal.sample_frames(avi, decode_mode="real").collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 3
    for doc_id, frames in by_doc.items():
        assert len(frames) == multimodal._avi_n_frames(doc_id)
        for r in sorted(frames, key=lambda x: x.frame_idx):
            assert bytes(r.frame) == multimodal._avi_frame_payload(
                doc_id, r.frame_idx
            )


def test_avi_frame_features_match_direct_computation(spark, sf_dir):
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(2)
    avi = multimodal.with_synthetic_avi(docs)
    rows = multimodal.avi_frame_features(avi).collect()
    assert rows
    for r in rows:
        raw = multimodal._avi_frame_payload(r.doc_id, r.frame_idx)
        v = np.frombuffer(raw, dtype=np.uint8).reshape(
            multimodal.AVI_H, multimodal.AVI_W, 3
        ).astype(np.int64)
        assert r.n_bytes == 144
        assert r.mean_px == int(v.sum()) / 144
        assert r.mean_r == int(v[:, :, 0].sum()) / 48
        assert r.mean_row0 == int(v[0].sum()) / 24


def test_png_encoder_forward_filters_roundtrip():
    """encode_png(filters=...) emits genuinely filtered scanlines
    (Sub/Up/Average/Paeth) that decode back to the identical pixels, for
    every channel count — the corpus builder for the unfilter paths."""
    import numpy as np

    rng = np.random.default_rng(11)
    for ch in (1, 2, 3, 4):
        w, h = 19, 9
        img = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
        rows = [bytes(bytearray(r)) for r in img]
        for ft in (0, 1, 2, 3, 4):
            blob = multimodal.encode_png(rows, w, h, n_channels=ch, filters=ft)
            dw, dh, dch, px = multimodal.decode_png(blob)
            assert (dw, dh, dch) == (w, h, ch)
            assert np.array_equal(px, img), (ch, ft)
        mixed = multimodal.encode_png(
            rows, w, h, n_channels=ch, filters=[r % 5 for r in range(h)]
        )
        assert np.array_equal(multimodal.decode_png(mixed)[3], img)
    # default stays byte-identical to explicit filter-0 (oracle contract)
    assert multimodal.encode_png(rows, w, h, n_channels=4) == multimodal.encode_png(
        rows, w, h, n_channels=4, filters=0
    )
    with pytest.raises(ValueError, match="filters"):
        multimodal.encode_png(rows, w, h, n_channels=4, filters=5)


def test_png_batch_decode_matches_per_blob():
    """decode_png_batch == [decode_png(b)] on a mixed corpus (ragged
    dims, all channel counts, all filters) — the lockstep vectorization
    must be invisible semantically."""
    import random

    import numpy as np

    rnd = random.Random(23)
    blobs = []
    for i in range(60):
        ch = rnd.choice([1, 2, 3, 4])
        w, h = rnd.randint(1, 24), rnd.randint(1, 16)
        rows = [
            bytes(bytearray(rnd.randrange(256) for _ in range(w * ch)))
            for _ in range(h)
        ]
        blobs.append(
            multimodal.encode_png(
                rows,
                w,
                h,
                n_channels=ch,
                filters=[rnd.randint(0, 4) for _ in range(h)],
            )
        )
    batch = multimodal.decode_png_batch(blobs)
    for blob, (bw, bh, bch, bpx) in zip(blobs, batch):
        sw, sh, sch, spx = multimodal.decode_png(blob)
        assert (sw, sh, sch) == (bw, bh, bch)
        assert np.array_equal(spx, bpx)
    assert multimodal.decode_png_batch([]) == []


def _png_header_only(depth: int, ctype: int, interlace: int) -> bytes:
    import struct

    ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, interlace)
    return multimodal.PNG_SIG + multimodal._png_chunk(b"IHDR", ihdr)


def test_png_ihdr_peek_and_support_gate():
    blob = multimodal.encode_png([b"ab", b"cd"], 2, 2, n_channels=1)
    assert multimodal.png_ihdr(blob) == (2, 2, 8, 0, 0)
    assert multimodal.stdlib_png_supported(blob)
    assert multimodal.png_ihdr(b"not a png") is None
    assert not multimodal.stdlib_png_supported(b"not a png")
    assert not multimodal.stdlib_png_supported(multimodal.PNG_SIG)  # truncated
    # palette / 16-bit / interlaced: real-encoder formats the stdlib
    # decoder declines -> must route to PIL, never raise ValueError
    # out of the signature check (r08 ADVICE, medium).
    assert not multimodal.stdlib_png_supported(_png_header_only(8, 3, 0))
    assert not multimodal.stdlib_png_supported(_png_header_only(16, 0, 0))
    assert not multimodal.stdlib_png_supported(_png_header_only(8, 2, 1))


@pytest.mark.skipif(
    multimodal.HAS_PIL, reason="with pillow installed the PIL branch decodes"
)
def test_real_decode_routes_unsupported_png_to_pil_seam():
    """A palette PNG under decode_mode='real' must hit the declared PIL
    seam (NotImplementedError), not a ValueError from inside the stdlib
    decoder the signature check used to route it into."""
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1], "blob": [_png_header_only(8, 3, 0)]})
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal._real_decode_batch(pdf)
