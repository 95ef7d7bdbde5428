"""Multimodal column plumbing (BASELINE.json surface).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata — the parquet/Arrow path moves bytes untouched, and
per-item decode/feature work happens in Arrow-batched pandas stages
(``mapInPandas``), which is exactly how a 100 TB media pipeline runs:
bytes never leave the executor, Python sees them as zero-copy Arrow
buffers, and the decode stage parallelizes per partition.

Decode kernels, by modality:

- **Images: REAL, stdlib, no seam** (since r08). ``encode_png_gray`` /
  ``decode_png`` are a genuine PNG codec on ``zlib`` + ``struct`` (the
  public W3C/RFC-2083 container: chunk CRCs, deflate, all five scanline
  filters), so ``with_synthetic_png`` -> ``png_features`` runs a real
  encode -> decode -> feature pipeline in any container, with
  md5-derived pixels a DuckDB oracle replays hash-exactly — the same
  pattern the audio modality proved in r02/r07.
- **Audio: REAL, stdlib, no seam** — RIFF/WAV through ``wave``.
- **Video: REAL, stdlib, no seam for uncompressed AVI** (since r08).
  ``encode_avi_rgb`` / ``decode_avi`` are a genuine RIFF/AVI codec on
  ``struct`` (the public Microsoft container: avih/strh/strf headers,
  '00db' DIB frames in bottom-up BGR, idx1), so ``with_synthetic_avi``
  -> ``avi_frame_features`` runs a real mux -> demux -> feature
  pipeline in any container with md5-replayable pixels. Compressed
  video (H.264 etc.) genuinely needs a codec library: that branch of
  ``sample_frames(decode_mode="real")`` keeps the PyAV probe and
  raises ``NotImplementedError`` at the exact seam when absent.
  ``decode_blobs``/``resize_images`` keep their fake modes for the
  digest-blob entries and PIL real modes for non-PNG formats; PNG-blob
  resize runs REAL via the stdlib codec with no PIL.
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
    """Real decode: PNG inputs the stdlib codec handles (8-bit,
    non-interlaced, gray/RGB/LA/RGBA — checked by an IHDR peek, not by
    signature alone) go through it with no third-party import; palette/
    16-bit/interlaced PNGs and other formats need PIL (per-channel pixel
    means as the 8-dim feature, zero-padded). PIL branch unit-tested
    under a skipif gate."""
    import numpy as np  # noqa: PLC0415

    raws = [bytes(blob) for blob in pdf["blob"]]
    # stdlib-decodable PNGs go through the batch decoder (the lockstep
    # vectorization needs the whole batch); the rest fall to PIL.
    png_idx = [i for i, r in enumerate(raws) if stdlib_png_supported(r)]
    decoded: dict[int, tuple] = dict(
        zip(png_idx, decode_png_batch([raws[i] for i in png_idx]))
    )
    n_bytes, widths, heights, chans, feats = [], [], [], [], []
    for i, raw in enumerate(raws):
        if i in decoded:
            w, h, ch, px = decoded[i]
            arr = px.reshape(h, w, ch)
            img_w, img_h = w, h
        else:
            Image = _require_pil()
            import io  # noqa: PLC0415

            img = Image.open(io.BytesIO(raw))
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            img_w, img_h = img.width, img.height
        n_bytes.append(len(raw))
        widths.append(img_w)
        heights.append(img_h)
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
    resizes stdlib-decodable PNG inputs (IHDR-peeked: 8-bit,
    non-interlaced, gray/RGB/LA/RGBA) with the stdlib codec (decode ->
    nearest-neighbor sample -> re-encode, no third-party import), and
    falls back to PIL for everything else — palette/16-bit/interlaced
    PNGs included (NotImplementedError when pillow is absent AND the
    stdlib codec can't take the input).
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(f"decode_mode must be 'fake' or 'real', got {decode_mode!r}")
    import hashlib

    def _resize_png_stdlib(blob: bytes) -> bytes:
        import numpy as np  # noqa: PLC0415

        w, h, ch, px = decode_png(blob)
        ri = (np.arange(height) * h) // height
        cols = (
            ((np.arange(width) * w) // width)[:, None] * ch + np.arange(ch)
        ).ravel()
        out = px[ri][:, cols]
        return encode_png(
            [bytes(bytearray(row)) for row in out], width, height, n_channels=ch
        )

    def _real_resize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for blob in pdf["blob"]:
            raw = bytes(blob)
            if stdlib_png_supported(raw):
                out.append(_resize_png_stdlib(raw))
                continue
            Image = _require_pil()
            import io  # noqa: PLC0415

            img = Image.open(io.BytesIO(raw)).resize((width, height))
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
        ids, idxs, frames = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            raw = bytes(blob)
            if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                # uncompressed-DIB AVI: the stdlib demux below, no
                # third-party import (frames come back as top-down RGB)
                _w, _h, decoded = decode_avi(raw)
                for i, fr in enumerate(decoded):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr.tobytes())
                continue
            if not HAS_AV:
                raise NotImplementedError(
                    "real frame sampling for compressed/non-AVI video needs "
                    "PyAV/ffmpeg; not importable in this environment — "
                    "uncompressed AVI demuxes via the stdlib RIFF walker"
                )
            import io  # noqa: PLC0415

            import av  # noqa: PLC0415

            with av.open(io.BytesIO(raw)) as container:
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
# Images: REAL in-container PNG codec (stdlib zlib + struct), SQL-replayable
# pixels — the audio pattern applied to the image modality (r07 verdict #3).
# The container format is the public PNG spec (W3C / RFC 2083): signature,
# IHDR, zlib-deflated filtered scanlines in IDAT, IEND, CRC-32 per chunk.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
PNG_FEATURE_BANDS = 8


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


_PNG_CTYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


def png_ihdr(raw: bytes):
    """Peek the IHDR without decoding: ``(width, height, bit_depth,
    color_type, interlace)``, or ``None`` if the blob isn't structurally
    a PNG (bad signature / truncated / first chunk not IHDR)."""
    import struct

    b = bytes(raw[:29])
    if b[:8] != PNG_SIG or len(b) < 29 or b[12:16] != b"IHDR":
        return None
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", b[16:29])
    return w, h, depth, ctype, interlace


def stdlib_png_supported(raw: bytes) -> bool:
    """True iff :func:`decode_png` handles this blob: 8-bit depth,
    non-interlaced, gray/RGB/LA/RGBA color type. Palette (ctype 3),
    16-bit, and interlaced PNGs — which real encoders do emit — route
    to PIL instead of raising out of the stdlib decoder."""
    ih = png_ihdr(raw)
    return ih is not None and ih[2] == 8 and ih[4] == 0 and ih[3] in _PNG_CHANNELS


def encode_png(
    scanlines: list[bytes],
    width: int,
    height: int,
    *,
    n_channels: int = 1,
    filters=None,
) -> bytes:
    """A genuine 8-bit PNG from raw scanline bytes (gray / gray+alpha /
    RGB / RGBA by ``n_channels``): IHDR + one IDAT + IEND, CRC-32 on
    every chunk. Any standards-compliant viewer opens the output; the
    point is the blob is a REAL container, not a digest stand-in.

    ``filters`` picks the per-row scanline filter: ``None`` (default)
    keeps the historical filter-0 output byte-identical (the synthetic
    corpora and their SQL oracles depend on that), an int applies one
    spec filter (0-4) to every row, and a sequence gives one filter per
    row — used to build the filter-heavy corpora real encoders emit,
    which exercise the decoder's Sub/Up/Average/Paeth unfilter paths."""
    import struct
    import zlib

    import numpy as np

    if n_channels not in _PNG_CTYPE:
        raise ValueError(f"n_channels must be 1/2/3/4, got {n_channels}")
    stride = width * n_channels
    if len(scanlines) != height or any(len(s) != stride for s in scanlines):
        raise ValueError("scanlines must be height rows of width*channels bytes")
    if filters is None:
        row_filters = [0] * height
    elif isinstance(filters, int):
        row_filters = [filters] * height
    else:
        row_filters = list(filters)
    if len(row_filters) != height or any(f not in (0, 1, 2, 3, 4) for f in row_filters):
        raise ValueError("filters must be height values in 0..4")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _PNG_CTYPE[n_channels], 0, 0, 0)
    if all(f == 0 for f in row_filters):
        raw = b"".join(b"\x00" + s for s in scanlines)
    else:
        # Forward filtering operates on the RAW neighbor bytes (spec
        # 6.4: "unsigned arithmetic modulo 256" on unfiltered values),
        # so every filter vectorizes with shifted views.
        ch = n_channels
        zeros = np.zeros(ch, dtype=np.int64)
        prev = np.zeros(stride, dtype=np.int64)
        parts = []
        for ft, s in zip(row_filters, scanlines):
            cur = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
            left = np.concatenate([zeros, cur[:-ch]]) if stride > ch else np.zeros(stride, dtype=np.int64)
            ul = np.concatenate([zeros, prev[:-ch]]) if stride > ch else np.zeros(stride, dtype=np.int64)
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = (cur - left) & 0xFF
            elif ft == 2:
                enc = (cur - prev) & 0xFF
            elif ft == 3:
                enc = (cur - (left + prev) // 2) & 0xFF
            else:
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
                )
                enc = (cur - pred) & 0xFF
            parts.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
            prev = cur
        raw = b"".join(parts)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray(scanlines: list[bytes], width: int, height: int) -> bytes:
    """Grayscale form of :func:`encode_png` (the synthetic-corpus shape)."""
    return encode_png(scanlines, width, height, n_channels=1)


def decode_png(blob: bytes):
    """REAL stdlib PNG decoder: chunk walk, IHDR parse, IDAT inflate,
    and full scanline unfiltering (all five spec filters — None, Sub,
    Up, Average, Paeth), returning ``(width, height, n_channels,
    pixels)`` with ``pixels`` an (h, w*channels) uint8 ndarray. Supports
    8-bit gray/RGB/gray+alpha/RGBA, non-interlaced — i.e. everything a
    filter-0 encoder (ours or a standard one) emits, plus the filter
    types real encoders pick. Unfiltering is vectorized where the spec
    allows: None/Up are whole-row uint8 numpy ops, Sub is a per-channel-
    lane prefix sum mod 256; Average/Paeth are left-recursive (truly
    sequential along the row) and run as tight plain-int bytearray
    loops. Callers gate foreign blobs with :func:`stdlib_png_supported`
    (palette/16-bit/interlaced -> PIL). Not a seam: no third-party
    import, runs in any container."""
    import struct
    import zlib

    import numpy as np

    if bytes(blob[:8]) != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    b = bytes(blob)
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("not a PNG: missing IHDR/IDAT")
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth} ctype={ctype} interlace={interlace}); "
            "this decoder handles 8-bit non-interlaced gray/RGB/LA/RGBA"
        )
    ch = _PNG_CHANNELS[ctype]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: IDAT length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    if not np.isin(ftypes, (0, 1, 2, 3, 4)).all():
        bad = int(ftypes[np.isin(ftypes, (0, 1, 2, 3, 4)).argmin()])
        raise ValueError(f"corrupt PNG: unknown filter type {bad}")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        ft = int(ftypes[r])
        line = arr[r, 1:]
        if ft == 0:  # None
            cur = line.copy()
        elif ft == 2:  # Up — uint8 addition wraps mod 256
            cur = line + prev
        elif ft == 1:  # Sub — per-channel-lane prefix sum mod 256
            cur = (
                (np.cumsum(line.reshape(width, ch), axis=0, dtype=np.int64) & 0xFF)
                .astype(np.uint8)
                .reshape(stride)
            )
        else:  # Average / Paeth: left-recursive, so sequential along the
            # row — a tight bytearray loop (plain ints, no numpy scalar
            # indexing) is the fast pure-Python form of that recursion.
            cur_b = bytearray(stride)
            line_b = line.tobytes()
            prev_b = prev.tobytes()
            if ft == 3:  # Average
                for i in range(stride):
                    a = cur_b[i - ch] if i >= ch else 0
                    cur_b[i] = (line_b[i] + ((a + prev_b[i]) >> 1)) & 0xFF
            else:  # Paeth
                for i in range(stride):
                    a = cur_b[i - ch] if i >= ch else 0
                    up = prev_b[i]
                    c = prev_b[i - ch] if i >= ch else 0
                    p = a + up - c
                    pa = p - a if p >= a else a - p
                    pb = p - up if p >= up else up - p
                    pc = p - c if p >= c else c - p
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    cur_b[i] = (line_b[i] + pred) & 0xFF
            cur = np.frombuffer(bytes(cur_b), dtype=np.uint8)
        out[r] = cur
        prev = out[r]
    return width, height, ch, out


def decode_png_batch(blobs):
    """Batch PNG decode: same result as ``[decode_png(b) for b in
    blobs]`` (pytest-pinned), but the Average/Paeth left-recursion —
    inherently sequential along a row — is vectorized ACROSS the batch:
    images decode in row-lockstep, and each sequential pixel step is one
    numpy op over every Average/Paeth row in flight, so per-step
    interpreter overhead amortizes over the whole Arrow batch instead of
    repeating per byte per image. This is the hot path ``png_features``
    and ``_real_decode_batch`` use: a mapInPandas stage hands us
    hundreds of blobs at a time, exactly the shape that makes the
    lockstep profitable. Mixed dims are right-padded to the batch max
    (every spec filter depends only on pixels at x' <= x, so padding
    never flows into real columns); mixed channel counts split into
    per-channel-count groups (lane offsets differ).
    """
    import struct
    import zlib

    import numpy as np

    results: list = [None] * len(blobs)
    groups: dict[int, list] = {}  # ch -> [(idx, w, h, rows_array)]
    for i, blob in enumerate(blobs):
        b = bytes(blob)
        if b[:8] != PNG_SIG:
            raise ValueError("not a PNG: bad signature")
        pos, ihdr, idat = 8, None, []
        while pos + 8 <= len(b):
            (ln,) = struct.unpack(">I", b[pos : pos + 4])
            typ = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if typ == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
        if ihdr is None or not idat:
            raise ValueError("not a PNG: missing IHDR/IDAT")
        w, h, depth, ctype, _comp, _filt, interlace = ihdr
        if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
            raise ValueError(
                f"unsupported PNG (depth={depth} ctype={ctype} interlace={interlace}); "
                "this decoder handles 8-bit non-interlaced gray/RGB/LA/RGBA"
            )
        ch = _PNG_CHANNELS[ctype]
        stride = w * ch
        raw = zlib.decompress(b"".join(idat))
        if len(raw) != h * (stride + 1):
            raise ValueError("corrupt PNG: IDAT length mismatch")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        if not np.isin(rows[:, 0], (0, 1, 2, 3, 4)).all():
            bad = rows[:, 0]
            bad = int(bad[np.isin(bad, (0, 1, 2, 3, 4)).argmin()])
            raise ValueError(f"corrupt PNG: unknown filter type {bad}")
        groups.setdefault(ch, []).append((i, w, h, rows))

    for ch, items in groups.items():
        n = len(items)
        max_w = max(w for _, w, _, _ in items)
        max_h = max(h for _, _, h, _ in items)
        max_stride = max_w * ch
        filt = np.zeros((n, max_h, max_stride + 1), dtype=np.uint8)
        for b_i, (_, w, h, rows) in enumerate(items):
            filt[b_i, :h, : w * ch + 1] = rows
        out = np.zeros((n, max_h, max_stride), dtype=np.uint8)
        prev = np.zeros((n, max_stride), dtype=np.uint8)
        for r in range(max_h):
            ft = filt[:, r, 0]
            line = filt[:, r, 1:]
            cur = line.copy()  # ft==0 rows (and padding rows) done
            m = ft == 2
            if m.any():
                cur[m] = line[m] + prev[m]  # uint8 wrap == mod 256
            m = ft == 1
            if m.any():
                lanes = line[m].reshape(-1, max_w, ch)
                cur[m] = (
                    (np.cumsum(lanes, axis=1, dtype=np.int64) & 0xFF)
                    .astype(np.uint8)
                    .reshape(-1, max_stride)
                )
            m = (ft == 3) | (ft == 4)
            if m.any():
                s_line = line[m].astype(np.int16)
                s_prev = prev[m].astype(np.int16)
                is_paeth = (ft[m] == 4)[:, None]
                s_cur = np.zeros_like(s_line)
                a = np.zeros((int(m.sum()), ch), dtype=np.int16)
                c = np.zeros_like(a)
                for x in range(max_w):
                    sl = slice(x * ch, (x + 1) * ch)
                    up = s_prev[:, sl]
                    p = a + up - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - up), np.abs(p - c)
                    pred = np.where(
                        is_paeth,
                        np.where(
                            (pa <= pb) & (pa <= pc),
                            a,
                            np.where(pb <= pc, up, c),
                        ),
                        (a + up) >> 1,
                    )
                    v = (s_line[:, sl] + pred) & 0xFF
                    s_cur[:, sl] = v
                    a, c = v, up
                cur[m] = s_cur.astype(np.uint8)
            out[:, r, :] = cur
            prev = cur
        for b_i, (idx, w, h, _) in enumerate(items):
            results[idx] = (w, h, ch, np.ascontiguousarray(out[b_i, :h, : w * ch]))
    return results


def _png_dims(doc_id: int) -> tuple[int, int]:
    import hashlib

    hx = hashlib.md5(f"png:{doc_id}".encode()).hexdigest()
    return 16 + int(hx[0:2], 16) % 16, 8 + int(hx[2:4], 16) % 8


def _png_scanline(doc_id: int, r: int, width: int) -> bytes:
    import hashlib

    raw = b"".join(
        hashlib.md5(f"png:{doc_id}:{r}:{j}".encode()).digest()
        for j in range((width + 15) // 16)
    )
    return raw[:width]


def with_synthetic_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a GENUINE PNG blob per row: 8-bit grayscale, dims
    16..31 × 8..15 from ``md5('png:{id}')``, scanline bytes the
    concatenated digests of ``'png:{id}:{row}:{chunk}'`` — a real
    container (spec-compliant chunks, CRCs, deflate) whose every pixel
    a DuckDB oracle recomputes from the same hashes without ever
    parsing a PNG. The image twin of ``with_synthetic_wav``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf[id_col]:
                w, h = _png_dims(doc_id)
                blobs.append(
                    encode_png_gray(
                        [_png_scanline(doc_id, r, w) for r in range(h)], w, h
                    )
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "png": blobs})

    return df.select(F.col(id_col)).mapInPandas(gen, "doc_id bigint, png binary")


PNG_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, n_channels int, "
    "n_pixels int, mean_lum double, std_lum double, n_edges int, "
    "band_sums array<long>"
)


def png_features(df: DataFrame, blob_col: str = "png") -> DataFrame:
    """Image feature extraction over PNG blobs via the REAL stdlib
    decoder (``decode_png`` — chunk walk, inflate, unfilter), no import
    seam: luminance mean/population-std, horizontal edge count
    (|Δ| >= 32 between neighbors in a row), and 8 row-band pixel SUMS
    (rows r ≡ j mod 8) as the retrieval feature vector. Sums and
    counts are exact integers and every float is one division/sqrt of
    exact sums, so a SQL oracle recomputing the md5-derived pixels
    matches bit-for-bit. Arrow batches in, scalars out; blobs never
    leave the executor."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_bytes", "width", "height", "n_channels",
                "n_pixels", "mean_lum", "std_lum", "n_edges", "band_sums",
            )}
            decoded = decode_png_batch([bytes(b) for b in pdf[blob_col]])
            for doc_id, blob, (w, h, ch, px) in zip(
                pdf["doc_id"], pdf[blob_col], decoded
            ):
                v = px.astype(np.int64)
                n = w * h * ch
                s, ss = int(v.sum()), int((v * v).sum())
                mean = s / n
                rows["doc_id"].append(doc_id)
                rows["n_bytes"].append(len(bytes(blob)))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_channels"].append(ch)
                rows["n_pixels"].append(n)
                rows["mean_lum"].append(mean)
                rows["std_lum"].append(float(np.sqrt(ss / n - mean * mean)))
                rows["n_edges"].append(int((np.abs(np.diff(v, axis=1)) >= 32).sum()))
                bands = np.arange(h) % PNG_FEATURE_BANDS
                rows["band_sums"].append(
                    [int(v[bands == j].sum()) for j in range(PNG_FEATURE_BANDS)]
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(feats, PNG_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Video: REAL in-container AVI codec (stdlib struct, RIFF walker) with
# uncompressed DIB frames — the WAV/PNG pattern applied to the video
# modality. The container is the public AVI RIFF spec (Microsoft, same
# RIFF framing as WAV): hdrl(avih + strl(strh/strf BITMAPINFOHEADER)) +
# movi('00db' raw frames, bottom-up BGR rows) + idx1.
# ---------------------------------------------------------------------------

AVI_W, AVI_H = 8, 6  # stride 24 bytes = multiple of 4 -> no row padding


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def encode_avi_rgb(
    frames: list[bytes], width: int, height: int, *, fps: int = 10
) -> bytes:
    """A genuine AVI from raw RGB frames (each ``width*height*3`` bytes,
    top-down rows): RIFF('AVI ') with avih/strh/strf headers, raw
    'DIB ' video stream ('00db' chunks, spec layout: bottom-up rows,
    BGR byte order), and an idx1 index. Any standards-compliant player
    opens the output; like the WAV/PNG encoders the point is a REAL
    container, not a digest stand-in."""
    import struct

    stride = width * 3
    if stride % 4:
        raise ValueError("width*3 must be a multiple of 4 (no row-padding support)")
    if any(len(f) != stride * height for f in frames):
        raise ValueError("frames must be width*height*3 RGB bytes")

    def to_dib(fdata: bytes) -> bytes:
        import numpy as np

        arr = np.frombuffer(fdata, dtype=np.uint8).reshape(height, width, 3)
        return arr[::-1, :, ::-1].tobytes()  # bottom-up rows, BGR

    frame_size = stride * height
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, frame_size * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, frame_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        frame_size, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    strl = _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_payload = b"movi"
    idx = b""
    for f in frames:
        idx += b"00db" + struct.pack("<III", 0x10, len(movi_payload), frame_size)
        movi_payload += _riff_chunk(b"00db", to_dib(f))
    movi = _riff_chunk(b"LIST", movi_payload)
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(blob: bytes):
    """REAL stdlib AVI demux: RIFF chunk walk, avih/strf parse, '00db'
    frame extraction with the DIB layout undone (bottom-up BGR back to
    top-down RGB). Returns ``(width, height, frames)`` with each frame
    an (h, w, 3) uint8 ndarray. Supports the uncompressed 24-bit DIB
    stream our encoder (or any BI_RGB writer at padding-free widths)
    emits; compressed fourccs raise — that is PyAV's job."""
    import struct

    import numpy as np

    b = bytes(blob)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    info = {"w": None, "h": None, "bits": None}
    raw_frames: list[bytes] = []

    def walk(data: bytes) -> None:
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            payload = data[pos + 8 : pos + 8 + sz]
            if len(payload) < sz:
                raise ValueError("corrupt AVI: truncated chunk")
            if fourcc == b"LIST":
                walk(payload[4:])
            elif fourcc == b"avih":
                if len(payload) < 40:
                    raise ValueError("corrupt AVI: short avih")
                info["w"], info["h"] = struct.unpack("<II", payload[32:40])
            elif fourcc == b"strf":
                if len(payload) < 20:
                    raise ValueError("corrupt AVI: short strf")
                (info["bits"],) = struct.unpack("<H", payload[14:16])
                (comp,) = struct.unpack("<I", payload[16:20])
                if comp != 0:
                    raise ValueError(f"unsupported AVI: compressed stream {comp:#x}")
            elif fourcc in (b"00db", b"00dc"):
                raw_frames.append(payload)
            pos += 8 + sz + (sz & 1)

    walk(b[12:])
    w, h = info["w"], info["h"]
    if not w or not h or not raw_frames:
        raise ValueError("not an AVI: missing avih/frames")
    if info["bits"] != 24:
        raise ValueError(f"unsupported AVI: {info['bits']}-bit frames (want 24)")
    frames = []
    for raw in raw_frames:
        if len(raw) != w * h * 3:
            raise ValueError("corrupt AVI: frame size mismatch")
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        frames.append(arr[::-1, :, ::-1].copy())  # undo bottom-up + BGR
    return w, h, frames


def _avi_n_frames(doc_id: int) -> int:
    import hashlib

    return 1 + int(hashlib.md5(f"avi:{doc_id}".encode()).hexdigest()[0:2], 16) % 4


def _avi_frame_payload(doc_id: int, f: int) -> bytes:
    """Generation-order frame bytes (top-down RGB rows): row r is the
    first 24 bytes of md5('avi:{id}:{f}:{r}:0') + md5(...':1') — the
    same digest-chain construction the WAV/PNG oracles replay."""
    import hashlib

    out = b""
    for r in range(AVI_H):
        raw = b"".join(
            hashlib.md5(f"avi:{doc_id}:{f}:{r}:{j}".encode()).digest()
            for j in range(2)
        )
        out += raw[: AVI_W * 3]
    return out


def with_synthetic_avi(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a GENUINE AVI blob per row: 8x6 24-bit DIB frames (1-4
    per doc from the leading digest byte) whose generation-order pixel
    bytes are md5 digest chains — a real video container a DuckDB
    oracle replays pixel-exactly without ever parsing RIFF."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf[id_col]:
                frames = [
                    _avi_frame_payload(doc_id, f)
                    for f in range(_avi_n_frames(doc_id))
                ]
                blobs.append(encode_avi_rgb(frames, AVI_W, AVI_H))
            yield pd.DataFrame({"doc_id": pdf[id_col], "avi": blobs})

    return df.select(F.col(id_col)).mapInPandas(gen, "doc_id bigint, avi binary")


AVI_FEATURES_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, n_bytes int, "
    "mean_px double, mean_r double, mean_row0 double"
)


def avi_frame_features(df: DataFrame, blob_col: str = "avi") -> DataFrame:
    """Frame features through the REAL stdlib demux (1->N fan-out in
    one Arrow hop): per frame, the all-bytes mean plus two
    scramble-sensitive means — the R channel (reds if the decoder's
    BGR unswap regressed) and row 0 (reds if the bottom-up unflip
    regressed). Sums are exact integers over md5-derived bytes, so the
    SQL oracle recomputes every value bit-for-bit."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_idx", "width", "height", "n_bytes",
                "mean_px", "mean_r", "mean_row0",
            )}
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                w, h, frames = decode_avi(bytes(blob))
                for i, fr in enumerate(frames):
                    v = fr.astype(np.int64)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_bytes"].append(w * h * 3)
                    rows["mean_px"].append(int(v.sum()) / (w * h * 3))
                    rows["mean_r"].append(int(v[:, :, 0].sum()) / (w * h))
                    rows["mean_row0"].append(int(v[0].sum()) / (w * 3))
            yield pd.DataFrame(rows)

    return df.mapInPandas(feats, AVI_FEATURES_SCHEMA)


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
