"""Multimodal column plumbing (BASELINE.json surface).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata — the parquet/Arrow path moves bytes untouched, and
per-item decode/feature work happens in Arrow-batched pandas stages
(``mapInPandas``), which is exactly how a 100 TB media pipeline runs:
bytes never leave the executor, Python sees them as zero-copy Arrow
buffers, and the decode stage parallelizes per partition.

Decode kernels: ``decode_mode="fake"`` derives deterministic
pseudo-features from the bytes so the full pipeline — schema, batching,
partitioning, output shape — is real and tested (and SQL-replayable by
the DuckDB oracle, since every fake value is a pure function of the md5
hex digest). ``decode_mode="real"`` uses PIL (images) / PyAV (video)
when importable — probed once at import time — and raises
``NotImplementedError`` at the exact seam otherwise, so this container
(no media libs) exercises the fake path while an image with PIL runs
the real kernels unchanged.
"""

from __future__ import annotations

import importlib.util

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

# Probe optional media libraries once; executors re-probe on first use
# (module import happens per python worker), so the flags are cheap and
# consistent across driver and executors for a homogeneous image.
HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_AV = importlib.util.find_spec("av") is not None

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, n_channels int, "
    f"feature array<float>"
)


def _require_pil():
    if not HAS_PIL:
        raise NotImplementedError(
            "real image decode needs PIL (pillow); not importable in this "
            "environment — the fake path exercises the same plumbing"
        )
    from PIL import Image  # noqa: PLC0415

    return Image


def _real_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """PIL-backed decode: blob -> dims/channels + an 8-dim feature
    (per-channel pixel means, zero-padded). Runs only when pillow is
    importable; unit-tested under a skipif gate."""
    Image = _require_pil()
    import io  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    n_bytes, widths, heights, chans, feats = [], [], [], [], []
    for blob in pdf["blob"]:
        raw = bytes(blob)
        img = Image.open(io.BytesIO(raw))
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        n_bytes.append(len(raw))
        widths.append(img.width)
        heights.append(img.height)
        chans.append(arr.shape[2])
        means = (arr.reshape(-1, arr.shape[2]).mean(axis=0) / 255.0).tolist()
        feats.append([float(x) for x in (means + [0.0] * FEATURE_DIM)[:FEATURE_DIM]])
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": pd.Series(n_bytes, dtype="int32"),
            "width": pd.Series(widths, dtype="int32"),
            "height": pd.Series(heights, dtype="int32"),
            "n_channels": pd.Series(chans, dtype="int32"),
            "feature": feats,
        }
    )


def with_synthetic_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic binary column (md5 digest bytes of the
    text) so the multimodal path is exercisable on the testdata corpus."""
    return df.select(
        F.col(id_col).alias("doc_id"), F.unhex(F.md5(F.col(text_col))).alias("blob")
    )


def blob_metadata(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Typed metadata over an opaque binary column — native expressions,
    no Python in the loop."""
    return df.select(
        F.col(id_col),
        F.length(F.col(blob_col)).cast("int").alias("n_bytes"),
        F.substring(F.hex(F.col(blob_col)), 1, 8).alias("magic_hex"),
    )


def decode_blobs(df: DataFrame, *, decode_mode: str = "fake") -> DataFrame:
    """Arrow-batched decode/feature-extract stage over (doc_id, blob).

    fake mode: width/height/channels and an 8-dim feature vector are
    pure functions of the digest bytes — deterministic, so unit tests
    can assert exact values. real mode: the seam for an actual decoder.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be 'fake' or 'real', got {decode_mode!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                yield _real_decode_batch(pdf)
                continue
            blobs = pdf["blob"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "width": blobs.map(lambda b: 16 + b[0] % 64).astype("int32"),
                    "height": blobs.map(lambda b: 16 + b[1] % 64).astype("int32"),
                    "n_channels": blobs.map(lambda b: 1 + b[2] % 4).astype("int32"),
                    "feature": blobs.map(
                        lambda b: [float(x) / 255.0 for x in b[:FEATURE_DIM]]
                    ),
                }
            )
            yield out

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, width int, height int, blob binary"


def resize_images(
    df: DataFrame, width: int, height: int, *, decode_mode: str = "fake"
) -> DataFrame:
    """Arrow-batched resize stage: (doc_id, blob) -> (doc_id, width,
    height, blob). The payload stays binary end to end — input bytes
    and output bytes both move as Arrow buffers, so a chain of media
    stages (decode -> resize -> encode) never serializes through
    Python objects row by row.

    fake mode emits a deterministic stand-in payload (digest of the
    input bytes + target dims) with the requested dims; real mode
    decodes with PIL, resizes, and re-encodes PNG (NotImplementedError
    when pillow is absent).
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be 'fake' or 'real', got {decode_mode!r}")
    import hashlib

    def _real_resize(pdf: pd.DataFrame) -> pd.DataFrame:
        Image = _require_pil()
        import io  # noqa: PLC0415

        out = []
        for blob in pdf["blob"]:
            img = Image.open(io.BytesIO(bytes(blob))).resize((width, height))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            out.append(buf.getvalue())
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "width": width, "height": height, "blob": out}
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                yield _real_resize(pdf)
                continue
            tag = f":{width}x{height}".encode()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "blob": pdf["blob"].map(
                        lambda b: hashlib.md5(bytes(b) + tag).digest()
                    ),
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(df: DataFrame, *, decode_mode: str = "fake") -> DataFrame:
    """Frame-sampling stage: one (doc_id, blob) video row fans out to
    N (doc_id, frame_idx, frame) rows — the 1->N batch shape every
    video pipeline needs, expressed in ``mapInPandas`` (a yielded batch
    may hold any number of output rows per input row; no explode of a
    materialized array of frames, so one huge video never builds its
    full frame list in memory at once).

    fake mode derives a deterministic frame count (1 + b[3] % 4) and
    per-frame payloads ``md5(hex(blob) + ":" + idx)`` — hex-string
    derived so a SQL oracle can replay them exactly
    (``md5(md5(text) || ':' || idx)``); real mode demuxes with PyAV
    when importable (NotImplementedError otherwise).
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be 'fake' or 'real', got {decode_mode!r}")
    import hashlib

    def _real_sample(pdf: pd.DataFrame) -> pd.DataFrame:
        if not HAS_AV:
            raise NotImplementedError(
                "real frame sampling needs PyAV/ffmpeg; not importable in "
                "this environment — the fake path exercises the same plumbing"
            )
        import io  # noqa: PLC0415

        import av  # noqa: PLC0415

        ids, idxs, frames = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            with av.open(io.BytesIO(bytes(blob))) as container:
                for i, frame in enumerate(container.decode(video=0)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame.to_image().tobytes())
        return pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                yield _real_sample(pdf)
                continue
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                for i in range(1 + b[3] % 4):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(hashlib.md5(f"{b.hex()}:{i}".encode()).digest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, schema=FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: REAL in-container decode (stdlib `wave`), SQL-replayable payload
# ---------------------------------------------------------------------------

AUDIO_SR = 8000
AUDIO_BLOCKS = 128  # 128 md5 digests -> 2048 8-bit PCM samples


def with_synthetic_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a GENUINE RIFF/WAV blob per row: 8-bit mono PCM at 8 kHz
    whose sample bytes are the concatenated md5 digests of
    ``'wav:{id}:{block}'`` — a real audio container (stdlib ``wave``
    writes the header) with an engine-replayable payload, so a DuckDB
    oracle can recompute every waveform feature from the same hashes.
    Unlike the image/video kernels (gated on PIL/PyAV), this decode
    path has no third-party dependency and runs REAL in any container."""
    import hashlib
    import io
    import wave as wave_mod

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf[id_col]:
                pcm = b"".join(
                    hashlib.md5(f"wav:{doc_id}:{blk}".encode()).digest()
                    for blk in range(AUDIO_BLOCKS)
                )
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(AUDIO_SR)
                    w.writeframes(pcm)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf[id_col], "wav": blobs})

    return df.select(F.col(id_col)).mapInPandas(gen, "doc_id bigint, wav binary")


def audio_features(df: DataFrame, blob_col: str = "wav") -> DataFrame:
    """Waveform feature extraction over WAV blobs: parse the RIFF
    container (stdlib ``wave`` — a real decode, not a fake), then RMS
    amplitude and zero-crossing count around the 8-bit midpoint. Arrow
    batches in, scalar features out; bytes never leave the executor."""
    import io
    import wave as wave_mod

    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "n_samples": [],
                "sample_rate": [],
                "duration_ms": [],
                "rms": [],
                "n_zero_cross": [],
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                with wave_mod.open(io.BytesIO(bytes(blob)), "rb") as w:
                    sr = w.getframerate()
                    n = w.getnframes()
                    pcm = np.frombuffer(w.readframes(n), dtype=np.uint8)
                x = pcm.astype(np.int64) - 128
                prod = x[:-1] * x[1:]
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sample_rate"].append(sr)
                out["duration_ms"].append(n * 1000 // sr)
                out["rms"].append(float(np.sqrt(np.mean((x.astype(np.float64)) ** 2))))
                out["n_zero_cross"].append(int((prod < 0).sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        feats,
        "doc_id bigint, n_samples int, sample_rate int, duration_ms int, "
        "rms double, n_zero_cross int",
    )
