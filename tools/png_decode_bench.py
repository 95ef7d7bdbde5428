#!/usr/bin/env python
"""Receipt for the vectorized PNG unfilter (VERDICT r08 action #2).

Builds a filter-heavy PNG corpus (filters 1-4, the choices real
encoders make — our production filter-0 blobs never hit these paths),
decodes it with the shipped ``decode_png`` and with the r08 per-byte
numpy-scalar loop (kept verbatim below as the reference), asserts
byte-identical pixels, and prints the wall ratio. Run:

    python tools/png_decode_bench.py [n_images] [width] [height]
"""

from __future__ import annotations

import hashlib
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

from bigdataamazon_spark.operators.multimodal import (  # noqa: E402
    PNG_SIG,
    _PNG_CHANNELS,
    decode_png,
    decode_png_batch,
    encode_png,
)


def _decode_png_r08(blob: bytes):
    """The r08 unfilter, verbatim (multimodal.py:404-434 at commit
    917acec): per-byte numpy-scalar loop for Sub/Average/Paeth."""
    b = bytes(blob)
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
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    ch = _PNG_CHANNELS[ctype]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                up = prev[i]
                if ft == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ft == 3:
                    cur[i] = (line[i] + (a + up) // 2) & 0xFF
                else:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return width, height, ch, out


def _pixels(seed: str, n: int) -> bytes:
    return b"".join(
        hashlib.md5(f"{seed}:{j}".encode()).digest() for j in range((n + 15) // 16)
    )[:n]


def main() -> int:
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    ch = 3
    blobs = []
    for i in range(n_img):
        rows = [_pixels(f"bench:{i}:{r}", w * ch) for r in range(h)]
        # filters 1-4 round-robin, offset per image -> uniform mix
        blobs.append(
            encode_png(
                rows, w, h, n_channels=ch, filters=[1 + (r + i) % 4 for r in range(h)]
            )
        )
    assert all(b[:8] == PNG_SIG for b in blobs)

    t0 = time.perf_counter()
    new = [decode_png(b) for b in blobs]
    t_new = time.perf_counter() - t0

    t0 = time.perf_counter()
    batch = decode_png_batch(blobs)
    t_batch = time.perf_counter() - t0

    t0 = time.perf_counter()
    old = [_decode_png_r08(b) for b in blobs]
    t_old = time.perf_counter() - t0

    for (nw, nh, nc, npx), (ow, oh, oc, opx), (bw, bh, bc, bpx) in zip(
        new, old, batch
    ):
        assert (nw, nh, nc) == (ow, oh, oc) == (bw, bh, bc)
        assert np.array_equal(npx, opx), "pixel mismatch: per-blob vs r08 loop"
        assert np.array_equal(npx, bpx), "pixel mismatch: per-blob vs batch"

    ratio = t_old / t_batch
    print(
        f"corpus: {n_img} PNGs {w}x{h} RGB, filters 1-4 uniform | "
        f"r08 loop: {t_old:.2f}s ({n_img / t_old:.1f} img/s) | "
        f"per-blob vectorized: {t_new:.2f}s ({n_img / t_new:.1f} img/s, "
        f"{t_old / t_new:.1f}x) | "
        f"batch (shipped hot path): {t_batch:.2f}s ({n_img / t_batch:.1f} img/s, "
        f"{ratio:.1f}x) | pixels byte-identical: yes"
    )
    if ratio < 10:
        print("WARN: hot-path speedup below the 10x receipt floor")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
