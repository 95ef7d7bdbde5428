"""Multimodal column plumbing (BASELINE.json surface).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata — the parquet/Arrow path moves bytes untouched, and
per-item decode/feature work happens in Arrow-batched pandas stages
(``mapInPandas``), which is exactly how a 100 TB media pipeline runs:
bytes never leave the executor, Python sees them as zero-copy Arrow
buffers, and the decode stage parallelizes per partition.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``decode_mode="fake"`` derives deterministic pseudo-features
from the bytes so the full pipeline — schema, batching, partitioning,
output shape — is real and tested; ``decode_mode="real"`` raises
``NotImplementedError`` at the exact seam where PIL/libav would slot in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, n_channels int, "
    f"feature array<float>"
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
                raise NotImplementedError(
                    "real decode needs an image/audio library (PIL/torchaudio); "
                    "not available in this environment — plug it in here"
                )
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
    input bytes + target dims) with the requested dims; real mode is
    the PIL/libvips seam.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be 'fake' or 'real', got {decode_mode!r}")
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real resize needs an image library (PIL/libvips); "
                    "not available in this environment — plug it in here"
                )
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
    per-frame payloads from the digest; real mode is the libav seam.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be 'fake' or 'real', got {decode_mode!r}")
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real frame sampling needs a video library (PyAV/ffmpeg); "
                    "not available in this environment — plug it in here"
                )
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                for i in range(1 + b[3] % 4):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(hashlib.md5(b + bytes([i])).digest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, schema=FRAMES_SCHEMA)
