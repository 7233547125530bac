"""JPEG (ITU-T T.81 / JFIF) decoder in pure numpy + stdlib.

Scope — the Huffman-coded DCT modes that dominate web-crawl images:
sequential baseline (SOF0/SOF1) AND progressive (SOF2, spectral
selection + successive approximation per Annex G), 8-bit precision,
1 (greyscale) or 3 (YCbCr) components, any integer sampling factors
(4:4:4, 4:2:2, 4:2:0, ...), restart markers, multi-segment DQT/DHT.
Everything here is from the public spec: marker structure and
Huffman/DC-prediction/zigzag from T.81 Annex B/F, the progressive
scan semantics (EOB runs, +-1 refinement, correction bits) from Annex
G, the YCbCr matrix from the JFIF spec.  Both modes share one
coefficient-state architecture: scans accumulate into per-component
zigzag coefficient grids; dequantize + IDCT + assembly run once at
the end — baseline is simply the one-scan special case.  Out-of-scope
variants return ``None`` (arithmetic coding, hierarchical, lossless,
12-bit, 4-component CMYK) so the caller can fall back to the
content-hash featurizer instead of producing wrong pixels.

Validation note: no reference codec exists in this environment, so
the progressive path is pinned by (a) an independent in-repo encoder
implementing the Annex-G ENCODER procedures and (b) the invariant
that progressive and baseline encodings of the same image share their
quantized coefficients — the decoded pixels must match the baseline
decode EXACTLY (tests/test_jpeg.py::test_progressive_*).

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

from fstd2pandas_spark.operators.llm._limits import MAX_DECODE_BYTES

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
    """Decode a sequential-baseline (SOF0/SOF1) or progressive (SOF2)
    Huffman JPEG to an (H, W, 3) uint8 RGB array, or ``None`` when the
    payload is not a JPEG or uses an out-of-scope variant (arithmetic
    coding / hierarchical / lossless / 12-bit / CMYK)."""
    if payload is None or len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        return None
    try:
        return _decode(payload)
    except (_UnsupportedJpeg, struct.error, IndexError, KeyError,
            ValueError):
        # KeyError: corrupted streams can reference undefined
        # quant/Huffman table ids — malformed, not a crash
        return None


class _Frame:
    """Frame state shared by every scan: geometry + zigzag-indexed
    int32 coefficient grids per component, sized to the padded
    interleaved MCU grid (non-interleaved scans address the top-left
    own-grid region)."""

    def __init__(self, h, w, comps):
        self.h, self.w, self.comps = h, w, comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        self.coefs = []
        self.own = []  # (own_bh, own_bw) per component
        # forged-SOF guard BEFORE allocation: 16-bit dims allow a
        # header to demand ~17 GiB of coefficient planes per component
        total = sum((self.mcus_y * vi) * (self.mcus_x * hi) * 64 * 4
                    for _, hi, vi, _ in comps)
        if total > MAX_DECODE_BYTES:
            raise _UnsupportedJpeg("SOF dimensions exceed decode budget")
        for _, hi, vi, _ in comps:
            self.coefs.append(np.zeros(
                (self.mcus_y * vi, self.mcus_x * hi, 64), dtype=np.int32))
            cw = -(-w * hi // self.hmax)   # ceil of scaled sample dims
            ch = -(-h * vi // self.vmax)
            self.own.append((-(-ch // 8), -(-cw // 8)))


def _decode(payload: bytes) -> np.ndarray:
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    frame: "_Frame | None" = None
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
                qtables[tq] = vals.astype(np.float64)  # zigzag order
        elif marker == 0xC4:  # DHT: one or more tables per segment
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = seg[p + 1:p + 17]
                nsym = sum(counts)
                symbols = seg[p + 17:p + 17 + nsym]
                huff[(tc, th)] = _Huff(counts, symbols)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / progressive
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
            frame = _Frame(h, w, comps)
            frame.progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise _UnsupportedJpeg("non-sequential/progressive SOF")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise _UnsupportedJpeg("SOS before SOF")
            ns = seg[0]
            scan_comps, scan_tables = [], {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                idx = next((k for k, cp in enumerate(frame.comps)
                            if cp[0] == cid), None)
                if idx is None:
                    raise _UnsupportedJpeg("scan of unknown component")
                scan_comps.append(idx)
                scan_tables[idx] = (tt >> 4, tt & 0x0F)
            ss, se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            # entropy data runs to the next real marker (FF00 stuffing,
            # FFD0-D7 restarts stay inside)
            j = i
            while j < n - 1:
                if payload[j] == 0xFF and payload[j + 1] != 0x00 \
                        and not (0xD0 <= payload[j + 1] <= 0xD7):
                    break
                j += 1
            _run_scan(payload[i:j], frame, scan_comps, scan_tables,
                      huff, restart_interval, ss, se, ah, al)
            i = j
        # other segments (APPn, COM) are skipped
    if frame is None:
        raise _UnsupportedJpeg("no scan")
    return _finish(frame, qtables)


def _split_restarts(entropy: bytes) -> list[_BitReader]:
    """Split at RSTn markers: each interval restarts the bit phase, DC
    predictors and EOB run (T.81 F.2.1.3.1)."""
    intervals, start, j = [], 0, 0
    while j < len(entropy) - 1:
        if entropy[j] == 0xFF and 0xD0 <= entropy[j + 1] <= 0xD7:
            intervals.append(entropy[start:j])
            start = j + 2
            j += 2
        else:
            j += 1
    intervals.append(entropy[start:])
    return [_BitReader(seg.replace(b"\xff\x00", b"\xff"))
            for seg in intervals]


def _run_scan(entropy, frame: _Frame, scan_comps, scan_tables, huff,
              restart_interval, ss, se, ah, al) -> None:
    """One entropy-coded scan into the frame's coefficient state.

    Sequential baseline is the ss=0/se=63/ah=al=0 special case of the
    general progressive machinery (T.81 G.2): DC-first decode plus
    AC-first decode where the in-block EOB is an EOB-run of length 1.
    """
    if not (0 <= ss <= se <= 63 and al <= 13):
        raise _UnsupportedJpeg("bad spectral selection")
    if getattr(frame, "progressive", False):
        # progressive scans are DC-only (0,0) or AC-only (ss >= 1);
        # a full-band scan under SOF2 is malformed (T.81 G.1.1.1.1)
        if ss == 0 and se != 0:
            raise _UnsupportedJpeg("mixed DC/AC progressive scan")
        if ss > 0 and len(scan_comps) != 1:
            raise _UnsupportedJpeg("interleaved progressive AC scan")
    interleaved = len(scan_comps) > 1
    if interleaved and ss != 0:
        raise _UnsupportedJpeg("interleaved AC scan")
    readers = _split_restarts(entropy)

    # unit walk: MCUs when interleaved, own-grid blocks otherwise
    if interleaved:
        n_units = frame.mcus_x * frame.mcus_y
    else:
        bh, bw = frame.own[scan_comps[0]]
        n_units = bh * bw
    per_interval = restart_interval if restart_interval else n_units

    state = {"pred": dict.fromkeys(scan_comps, 0), "eobrun": 0}
    reader = readers[0]
    for u in range(n_units):
        if u and restart_interval and u % per_interval == 0:
            idx = u // per_interval
            if idx >= len(readers):
                raise _UnsupportedJpeg("missing restart interval")
            reader = readers[idx]
            state = {"pred": dict.fromkeys(scan_comps, 0), "eobrun": 0}
        if interleaved:
            my, mx = divmod(u, frame.mcus_x)
            for ci in scan_comps:
                _, hi, vi, _ = frame.comps[ci]
                for v in range(vi):
                    for hh in range(hi):
                        _decode_block(
                            reader, frame.coefs[ci][my * vi + v,
                                                    mx * hi + hh],
                            ci, scan_tables, huff, state, ss, se, ah, al)
        else:
            ci = scan_comps[0]
            by, bx = divmod(u, frame.own[ci][1])
            _decode_block(reader, frame.coefs[ci][by, bx], ci,
                          scan_tables, huff, state, ss, se, ah, al)


def _decode_block(reader, coef, ci, scan_tables, huff, state,
                  ss, se, ah, al) -> None:
    """Decode one block's contribution for the current scan into its
    zigzag-indexed coefficient vector."""
    if ss == 0:                               # DC (first or refinement)
        if ah == 0:
            dc_t = huff.get((0, scan_tables[ci][0]))
            if dc_t is None:
                raise _UnsupportedJpeg("missing DC table")
            s = reader.decode(dc_t)
            if s > 15:
                raise _UnsupportedJpeg("bad DC size")
            diff = _extend(reader.read_bits(s), s)
            state["pred"][ci] += diff
            coef[0] = state["pred"][ci] << al
        else:                                 # one correction bit
            if reader.read_bit():
                coef[0] |= (1 << al)
        if se == 0:
            return
    first_k = max(ss, 1)
    ac_t = huff.get((1, scan_tables[ci][1]))
    if ac_t is None:
        raise _UnsupportedJpeg("missing AC table")
    if ah == 0:
        _ac_first(reader, coef, ac_t, state, first_k, se, al)
    else:
        _ac_refine(reader, coef, ac_t, state, first_k, se, al)


def _ac_first(reader, coef, ac_t, state, ss, se, al) -> None:
    """T.81 G.2.2: history-free AC band decode with EOB runs."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                       # ZRL
                k += 16
                continue
            # EOBn: run of (1<<r)+bits blocks whose band ends here
            state["eobrun"] = (1 << r) + reader.read_bits(r) - 1
            return
        k += r
        if k > se:
            raise _UnsupportedJpeg("AC index overrun")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, coef, ac_t, state, ss, se, al) -> None:
    """T.81 G.1.2.3 successive-approximation AC refinement: newly
    significant coefficients arrive as +-1 at bit `al`; already-
    significant ones absorb one correction bit whenever the walk
    passes them."""
    def correct(k):
        if reader.read_bit():
            coef[k] += (1 << al) if coef[k] > 0 else -(1 << al)

    if state["eobrun"] > 0:
        for k in range(ss, se + 1):
            if coef[k]:
                correct(k)
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0 and r < 15:                 # EOBn
            state["eobrun"] = (1 << r) + reader.read_bits(r) - 1
            while k <= se:
                if coef[k]:
                    correct(k)
                k += 1
            return
        if s == 0:                            # ZRL: 16 zero-history skips
            newval = 0
        elif s == 1:
            newval = (1 << al) if reader.read_bit() else -(1 << al)
        else:
            raise _UnsupportedJpeg("refinement magnitude > 1")
        while k <= se:
            if coef[k]:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            coef[k] = newval
        k += 1


def _finish(frame: _Frame, qtables) -> np.ndarray:
    """Dequantize + batched IDCT + plane assembly + colour convert."""
    h, w = frame.h, frame.w
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(frame.comps):
        if tq not in qtables:
            raise _UnsupportedJpeg("missing quant table")
        bh, bw = frame.coefs[ci].shape[:2]
        zz = frame.coefs[ci].reshape(bh * bw, 64).astype(np.float64) \
            * qtables[tq]                     # both in zigzag order
        blocks = np.zeros((bh * bw, 64))
        blocks[:, ZIGZAG] = zz
        arr = _idct_blocks(blocks.reshape(-1, 8, 8)) + 128.0
        plane = arr.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full resolution by pixel replication, then crop
        plane = np.repeat(np.repeat(plane, frame.vmax // vi, axis=0),
                          frame.hmax // hi, axis=1)
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
