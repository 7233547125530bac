"""Baseline JPEG (ITU-T T.81 / JFIF) decoder in pure numpy + stdlib.

Scope — the sequential-DCT Huffman baseline that dominates web-crawl
images: 8-bit precision, SOF0/SOF1 frames, 1 (greyscale) or 3 (YCbCr)
components, any integer sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
restart markers, multi-segment DQT/DHT.  Everything here is from the
public spec: marker structure and Huffman/DC-prediction/zigzag from
T.81 Annex B/F, the YCbCr matrix from the JFIF spec.  Out-of-scope
variants return ``None`` (progressive SOF2, arithmetic coding, 12-bit,
4-component CMYK) so the caller can fall back to the content-hash
featurizer instead of producing wrong pixels — the same honesty
contract as the PNG decoder's palette/Adam7 fallback.

Decode strategy: Huffman entropy decode is a sequential bit walk (pure
Python over the de-stuffed byte array — inherently serial, bounded by
image size), but everything after it is vectorized numpy: all 8x8
coefficient blocks of a component batch through ONE einsum IDCT, and
plane assembly / chroma upsampling / colour conversion are whole-array
ops.  This runs per-asset inside Arrow-batched ``mapInPandas``
(multimodal.py), so the distribution story is Spark's, not this
module's.

Reference behavior parity: the reference ships no image codec either —
its pipeline treats media as opaque payloads handed to external tools.
This decoder widens what "decodable" means for the multimodal layer
beyond it (PPM/BMP/PNG/WAV, now JPEG).
"""

from __future__ import annotations

import struct

import numpy as np

#: T.81 Figure A.6 zig-zag ordering of the 64 DCT coefficients
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal 1-D DCT-II basis: M[u, x] = a(u) cos((2x+1)u*pi/16);
#: forward C = M f M^T, inverse f = M^T C M
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = np.sqrt(0.125) if _u == 0 else 0.5
        _M[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _a


class _UnsupportedJpeg(Exception):
    """Internal: structurally valid JPEG outside the baseline scope."""


class _Huff:
    """Canonical Huffman table -> (length, code) dict (T.81 Annex C)."""

    __slots__ = ("lut",)

    def __init__(self, counts: bytes, symbols: bytes) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # past the end: T.81 pads the final byte with 1-bits; a
            # well-formed stream never *consumes* meaningful bits here
            return 0
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        code, length = 0, 0
        lut = table.lut
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise _UnsupportedJpeg("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude field to its value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Batched 2-D inverse DCT over (n, 8, 8) coefficient blocks."""
    return np.einsum("ux,nuv,vy->nxy", _M, blocks, _M, optimize=True)


def decode_jpeg(payload: bytes) -> "np.ndarray | None":
    """Decode a baseline JPEG to an (H, W, 3) uint8 RGB array, or
    ``None`` when the payload is not a JPEG or uses an out-of-scope
    variant (progressive / arithmetic / 12-bit / CMYK)."""
    if payload is None or len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        return None
    try:
        return _decode(payload)
    except (_UnsupportedJpeg, struct.error, IndexError, KeyError,
            ValueError):
        # KeyError: corrupted streams can reference undefined
        # quant/Huffman table ids — malformed, not a crash
        return None


def _decode(payload: bytes) -> np.ndarray:
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    frame = None  # (H, W, [(comp_id, hi, vi, tq), ...])
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise _UnsupportedJpeg("marker desync")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seg_len = struct.unpack(">H", payload[i:i + 2])[0]
        seg = payload[i + 2:i + seg_len]
        i += seg_len
        if marker == 0xDB:  # DQT: one or more tables per segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                q = np.zeros(64, dtype=np.float64)
                q[ZIGZAG] = vals.astype(np.float64)
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT: one or more tables per segment
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = seg[p + 1:p + 17]
                nsym = sum(counts)
                symbols = seg[p + 17:p + 17 + nsym]
                huff[(tc, th)] = _Huff(counts, symbols)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline huffman
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise _UnsupportedJpeg("precision != 8")
            if nc not in (1, 3):
                raise _UnsupportedJpeg(f"{nc}-component frame")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise _UnsupportedJpeg("bad sampling factors")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise _UnsupportedJpeg("non-baseline SOF")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                raise _UnsupportedJpeg("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            # entropy data runs to the next real marker (FF00 stuffing,
            # FFD0-D7 restarts stay inside)
            j = i
            while j < n - 1:
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,) \
                        and not (0xD0 <= payload[j + 1] <= 0xD7):
                    break
                j += 1
            return _decode_scan(payload[i:j], frame, scan_tables,
                                qtables, huff, restart_interval)
    raise _UnsupportedJpeg("no scan")


def _decode_scan(entropy: bytes, frame, scan_tables, qtables, huff,
                 restart_interval: int) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # split at restart markers: each interval restarts the bit phase
    # and the DC predictors (T.81 F.2.1.3.1)
    intervals = []
    start = 0
    j = 0
    while j < len(entropy) - 1:
        if entropy[j] == 0xFF and 0xD0 <= entropy[j + 1] <= 0xD7:
            intervals.append(entropy[start:j])
            start = j + 2
            j += 2
        else:
            j += 1
    intervals.append(entropy[start:])
    readers = [_BitReader(seg.replace(b"\xff\x00", b"\xff"))
               for seg in intervals]

    n_mcus = mcus_x * mcus_y
    per_interval = restart_interval if restart_interval else n_mcus
    # coefficient blocks per component, decoded in MCU order
    blocks: list[list[np.ndarray]] = [[] for _ in comps]
    reader = readers[0]
    pred = [0] * len(comps)
    for mcu in range(n_mcus):
        if mcu and restart_interval and mcu % per_interval == 0:
            idx = mcu // per_interval
            if idx >= len(readers):
                raise _UnsupportedJpeg("missing restart interval")
            reader = readers[idx]
            pred = [0] * len(comps)
        for ci, (cid, hi, vi, tq) in enumerate(comps):
            dc_t = huff.get((0, scan_tables[cid][0]))
            ac_t = huff.get((1, scan_tables[cid][1]))
            if dc_t is None or ac_t is None:
                raise _UnsupportedJpeg("missing Huffman table")
            for _ in range(hi * vi):
                zz = np.zeros(64, dtype=np.float64)
                s = reader.decode(dc_t)
                diff = _extend(reader.read_bits(s), s)
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode(ac_t)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise _UnsupportedJpeg("AC index overrun")
                    zz[k] = _extend(reader.read_bits(s), s)
                    k += 1
                blk = np.zeros(64, dtype=np.float64)
                blk[ZIGZAG] = zz
                blocks[ci].append(blk.reshape(8, 8) * qtables[tq])

    # batched IDCT + plane assembly per component
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        arr = _idct_blocks(np.stack(blocks[ci])) + 128.0
        plane = np.zeros((mcus_y * vi * 8, mcus_x * hi * 8))
        b = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for v in range(vi):
                    for hh in range(hi):
                        plane[(my * vi + v) * 8:(my * vi + v) * 8 + 8,
                              (mx * hi + hh) * 8:(mx * hi + hh) * 8 + 8] \
                            = arr[b]
                        b += 1
        # upsample to full resolution by pixel replication, then crop
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255) \
        .round().astype(np.uint8)
