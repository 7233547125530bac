"""Fuller PNG ENCODER — test scaffolding for the library decoder.

Covers what tests/test_llm.py's minimal `_png_bytes` does not: palette
images (PLTE), sub-byte depths (1/2/4, MSB-first packing), 16-bit
samples (big-endian), and Adam7 interlacing (RFC 2083 §2.6 pass
grids), with per-scanline filter selection on the byte level (bpp
offset per §6.1).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))


def _serialize_rows(px: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) int samples -> (h, stride) scanline bytes."""
    h, w, ch = px.shape
    if depth == 16:
        return px.astype(">u2").reshape(h, -1).view(np.uint8) \
            .reshape(h, w * ch * 2)
    if depth == 8:
        return px.astype(np.uint8).reshape(h, w * ch)
    assert ch == 1
    bits = ((px.reshape(h, w, 1).astype(np.uint8)
             >> np.arange(depth - 1, -1, -1)) & 1).reshape(h, w * depth)
    return np.packbits(bits, axis=1)  # zero-padded to byte boundary


def _filter_rows(rows: np.ndarray, bpp: int, filters) -> bytes:
    h, stride = rows.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = filters[y % len(filters)] if filters else 0
        row = rows[y].astype(np.int16)
        enc = row.copy()
        for i in range(stride):
            a = int(row[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
            else:
                pred = 0
            enc[i] = (int(row[i]) - pred) & 0xFF
        out += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def encode_png(samples: np.ndarray, ctype: int = 2, depth: int = 8,
               interlace: int = 0, filters=None,
               palette: "np.ndarray | None" = None) -> bytes:
    """`samples`: (h, w) for 1-channel ctypes (grey values in the depth
    range, or palette indices), (h, w, ch) otherwise."""
    ch = _CHANNELS[ctype]
    px = samples if samples.ndim == 3 else samples[..., None]
    h, w = px.shape[:2]
    assert px.shape[2] == ch
    bpp = max(1, ch * depth // 8)

    if interlace == 0:
        raw = _filter_rows(_serialize_rows(px, depth), bpp, filters)
    else:
        raw = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _filter_rows(_serialize_rows(sub, depth), bpp, filters)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if ctype == 3:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out
