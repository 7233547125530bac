"""Minimal baseline JPEG ENCODER — test scaffolding only.

Produces spec-conformant sequential-DCT Huffman JPEGs (T.81 Annex B
syntax) to exercise the library decoder from the outside: 4:4:4 and
4:2:0 sampling, 8- and 16-bit DQT precision, restart markers, greyscale
frames, and per-image canonical Huffman tables built from the actual
symbol frequencies (so the decoder's DHT parsing is tested against
tables it has never seen, not just the Annex K constants).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from fstd2pandas_spark.operators.llm.jpeg import ZIGZAG, _M


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Symbol -> code length via plain Huffman; asserts depth <= 16
    (true for any test image small enough to live in a unit test)."""
    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, [s]) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = dict.fromkeys(freqs, 0)
    i = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, s1 + s2))
        i += 1
    assert max(depth.values()) <= 16, "test image produced >16-bit codes"
    return depth


def _canonical(freqs: dict[int, int]):
    """(counts[16], symbols, symbol->(code,length)) per T.81 Annex C."""
    depth = _huffman_lengths(freqs)
    ordered = sorted(depth.items(), key=lambda kv: (kv[1], kv[0]))
    counts = [0] * 16
    for _, ln in ordered:
        counts[ln - 1] += 1
    codes = {}
    code, prev_len = 0, 0
    for sym, ln in ordered:
        code <<= (ln - prev_len)
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return bytes(counts), bytes(s for s, _ in ordered), codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _value_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate), forward DCT, quantize."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            f = padded[by:by + 8, bx:bx + 8] - 128.0
            c = _M @ f @ _M.T
            blocks.append(np.round(c / q).astype(np.int64))
    return np.stack(blocks), pw // 8


def _prepare(img, subsample, quant_y, quant_c, greyscale):
    """Shared front half of both encoders: colour transform, sampling,
    per-component quantized block grids (padded to the MCU walk)."""
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy = np.ones((8, 8)) if quant_y is None else quant_y.astype(np.float64)
    qc = qy if quant_c is None else quant_c.astype(np.float64)

    if greyscale:
        comps = [("y", y, qy, 1, 1, 0)]
    elif subsample:
        # pad to 16-multiples so Y MCU coverage and 2x2 chroma boxes align
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        y2 = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
        cb2 = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr2 = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        box = lambda p: p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comps = [("y", y2, qy, 2, 2, 0),
                 ("cb", box(cb2), qc, 1, 1, 1),
                 ("cr", box(cr2), qc, 1, 1, 1)]
    else:
        comps = [("y", y, qy, 1, 1, 0),
                 ("cb", cb, qc, 1, 1, 1),
                 ("cr", cr, qc, 1, 1, 1)]

    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized blocks per component, indexable by (block_y, block_x)
    per_comp = []
    for _, plane, q, hi, vi, tq in comps:
        qb, bw = _plane_blocks(plane, q)
        # grid of blocks for MCU-ordered emission
        bh = len(qb) // bw
        grid = qb.reshape(bh, bw, 8, 8)
        # an MCU walk may step past the plane's block grid when the
        # plane rounds to fewer blocks than mcus * sampling: replicate
        # edge blocks (legal — decoder crops)
        need_h, need_w = mcus_y * vi, mcus_x * hi
        if bh < need_h:
            grid = np.concatenate(
                [grid, np.repeat(grid[-1:], need_h - bh, axis=0)], axis=0)
        if bw < need_w:
            grid = np.concatenate(
                [grid, np.repeat(grid[:, -1:], need_w - bw, axis=1)], axis=1)
        per_comp.append(grid)
    return h, w, comps, per_comp, hmax, vmax, mcus_x, mcus_y


def _headers(h, w, comps, sof_marker=0xC0):
    """SOI + DQT + SOF segments shared by both encoders."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    def dqt(tq, q):
        zz = q.reshape(64)[ZIGZAG]
        if q.max() > 255:
            return bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", int(v)) for v in zz)
        return bytes([tq]) + bytes(int(v) for v in zz)

    seen_q = []
    for _, _, q, _, _, tq in comps:
        if tq not in seen_q:
            seg(0xDB, dqt(tq, q))
            seen_q.append(tq)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, (_, _, _, hi, vi, tq) in enumerate(comps):
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    seg(sof_marker, sof)
    return out, seg


def encode_jpeg(img: np.ndarray, subsample: bool = False,
                quant_y: "np.ndarray | None" = None,
                quant_c: "np.ndarray | None" = None,
                restart_interval: int = 0,
                greyscale: bool = False) -> bytes:
    """Encode (H, W, 3) uint8 RGB as a baseline JPEG."""
    h, w, comps, per_comp, hmax, vmax, mcus_x, mcus_y = _prepare(
        img, subsample, quant_y, quant_c, greyscale)

    # MCU-ordered symbol stream; restart intervals reset DC predictors
    def walk():
        pred = [0] * len(comps)
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and mcu and mcu % restart_interval == 0:
                pred = [0] * len(comps)
                yield ("RST", (mcu // restart_interval - 1) % 8)
            my, mx = divmod(mcu, mcus_x)
            for ci, (_, _, _, hi, vi, tq) in enumerate(comps):
                for v in range(vi):
                    for hh in range(hi):
                        blk = per_comp[ci][my * vi + v, mx * hi + hh]
                        zz = blk.reshape(64)[ZIGZAG]
                        dc = int(zz[0])
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = _size_cat(diff)
                        yield ("DC", ci, s, _value_bits(diff, s))
                        run = 0
                        last_nz = max(
                            (k for k in range(1, 64) if zz[k]), default=0)
                        for k in range(1, last_nz + 1):
                            v2 = int(zz[k])
                            if v2 == 0:
                                run += 1
                                continue
                            while run > 15:
                                yield ("AC", ci, 0xF0, 0, 0)
                                run -= 16
                            s = _size_cat(v2)
                            yield ("AC", ci, (run << 4) | s, s,
                                   _value_bits(v2, s))
                            run = 0
                        if last_nz < 63:
                            yield ("AC", ci, 0x00, 0, 0)  # EOB

    # pass 1: frequencies per (class, table-id)
    tid_of = [c[5] for c in comps]
    freqs = {}  # (cls, tid) -> {symbol: count}
    for ev in walk():
        if ev[0] == "RST":
            continue
        cls = 0 if ev[0] == "DC" else 1
        sym = ev[2]
        key = (cls, tid_of[ev[1]])
        freqs.setdefault(key, {})[sym] = freqs.get(key, {}).get(sym, 0) + 1
    tables = {k: _canonical(v) for k, v in freqs.items()}

    # pass 2: emit entropy bits
    bw_ = _BitWriter()
    entropy = bytearray()
    for ev in walk():
        if ev[0] == "RST":
            bw_.flush()
            entropy += bw_.out
            bw_ = _BitWriter()
            entropy += bytes([0xFF, 0xD0 + ev[1]])
            continue
        cls = 0 if ev[0] == "DC" else 1
        code, ln = tables[(cls, tid_of[ev[1]])][2][ev[2]]
        bw_.write(code, ln)
        if ev[0] == "DC":
            if ev[2]:
                bw_.write(ev[3], ev[2])
        else:
            if ev[3]:
                bw_.write(ev[4], ev[3])
    bw_.flush()
    entropy += bw_.out

    # assemble segments
    out, seg = _headers(h, w, comps, 0xC0)
    for (cls, tid), (counts, symbols, _) in sorted(tables.items()):
        seg(0xC4, bytes([(cls << 4) | tid]) + counts + symbols)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci, (_, _, _, _, _, tq) in enumerate(comps):
        sos += bytes([ci + 1, (tq << 4) | tq])  # dc/ac table = tq id
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(entropy)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------------------------- progressive

def encode_jpeg_progressive(img: np.ndarray, al: int = 1,
                            bands=((1, 5), (6, 63)),
                            subsample: bool = False,
                            quant_y: "np.ndarray | None" = None,
                            quant_c: "np.ndarray | None" = None,
                            greyscale: bool = False) -> bytes:
    """Progressive (SOF2) encoder: spectral selection over `bands` and
    `al` levels of successive approximation, per T.81 Annex G — DC
    first interleaved at point transform `al`, DC refinement scans one
    bit at a time, per-component AC first scans per band at `al`, then
    per-component AC refinement scans (newly-significant +-1 symbols,
    EOB runs carrying the buffered correction bits)."""
    h, w, comps, per_comp, hmax, vmax, mcus_x, mcus_y = _prepare(
        img, subsample, quant_y, quant_c, greyscale)
    tid_of = [c[5] for c in comps]

    # zigzag coefficient grid per component + own (non-interleaved) dims
    zz_of = []
    own = []
    for ci, (_, _, _, hi, vi, tq) in enumerate(comps):
        g = per_comp[ci]
        zz_of.append(g.reshape(g.shape[0], g.shape[1], 64)[:, :, ZIGZAG])
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        own.append((-(-ch // 8), -(-cw // 8)))

    def mcu_blocks():
        """Interleaved DC walk: yields (ci, zigzag-coef-vector)."""
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (_, _, _, hi, vi, _) in enumerate(comps):
                for v in range(vi):
                    for hh in range(hi):
                        yield ci, zz_of[ci][my * vi + v, mx * hi + hh]

    def raster_blocks(ci):
        """Non-interleaved walk over the component's OWN block grid."""
        bh, bw = own[ci]
        for by in range(bh):
            for bx in range(bw):
                yield zz_of[ci][by, bx]

    def dc_first_events(pt):
        pred = [0] * len(comps)
        for ci, zz in mcu_blocks():
            v = int(zz[0]) >> pt              # arithmetic point transform
            diff = v - pred[ci]
            pred[ci] = v
            s = _size_cat(diff)
            yield ("sym", (0, tid_of[ci]), s)
            yield ("bits", _value_bits(diff, s), s)

    def dc_refine_events(pt):
        for ci, zz in mcu_blocks():
            yield ("bits", (int(zz[0]) >> pt) & 1, 1)

    def ac_first_events(ci, lo, hi_, pt):
        tid = (1, tid_of[ci])
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                yield ("sym", tid, r << 4)
                yield ("bits", eobrun - (1 << r), r)
                eobrun = 0

        for zz in raster_blocks(ci):
            vals = [int(v) // (1 << pt) if v >= 0
                    else -((-int(v)) >> pt) for v in zz[lo:hi_ + 1]]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    yield from flush()
                continue
            yield from flush()
            run = 0
            for i in range(nz[-1] + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    yield ("sym", tid, 0xF0)
                    run -= 16
                s = _size_cat(v)
                yield ("sym", tid, (run << 4) | s)
                yield ("bits", _value_bits(v, s), s)
                run = 0
            if nz[-1] < hi_ - lo:
                eobrun += 1
        yield from flush()

    def ac_refine_events(ci, lo, hi_, ah, pt):
        tid = (1, tid_of[ci])
        eobrun = 0
        pending = []

        def flush():
            nonlocal eobrun, pending
            if eobrun:
                r = eobrun.bit_length() - 1
                yield ("sym", tid, r << 4)
                yield ("bits", eobrun - (1 << r), r)
                for b in pending:
                    yield ("bits", b, 1)
                pending = []
                eobrun = 0

        for zz in raster_blocks(ci):
            band = [int(v) for v in zz[lo:hi_ + 1]]
            prev = [abs(v) >> ah != 0 for v in band]
            newly = [not p and ((abs(v) >> pt) & 1) == 1
                     for p, v in zip(prev, band)]
            corr = [(abs(v) >> pt) & 1 for v in band]
            nks = [i for i, nw in enumerate(newly) if nw]
            if not nks:
                eobrun += 1
                pending += [corr[i] for i, p in enumerate(prev) if p]
                if eobrun == 0x7FFF:
                    yield from flush()
                continue
            yield from flush()
            k = 0
            for nk in nks:
                r = sum(1 for j in range(k, nk) if not prev[j])
                while r > 15:
                    yield ("sym", tid, 0xF0)      # ZRL: 16 history-zeros
                    consumed = 0
                    while consumed < 16:
                        if prev[k]:
                            yield ("bits", corr[k], 1)
                        else:
                            consumed += 1
                        k += 1
                    r -= 16
                yield ("sym", tid, (r << 4) | 1)
                yield ("bits", 1 if band[nk] > 0 else 0, 1)
                for j in range(k, nk):
                    if prev[j]:
                        yield ("bits", corr[j], 1)
                k = nk + 1
            if k <= hi_ - lo:
                eobrun += 1
                pending += [corr[j] for j in range(k, hi_ - lo + 1)
                            if prev[j]]
        yield from flush()

    # scan script: DC first, DC refinements, AC firsts, AC refinements
    scans = [(dc_first_events(al), list(range(len(comps))), 0, 0, 0, al)]
    for a in range(al - 1, -1, -1):
        scans.append((dc_refine_events(a), list(range(len(comps))),
                      0, 0, a + 1, a))
    for lo, hi_ in bands:
        for ci in range(len(comps)):
            scans.append((ac_first_events(ci, lo, hi_, al), [ci],
                          lo, hi_, 0, al))
    for a in range(al - 1, -1, -1):
        for lo, hi_ in bands:
            for ci in range(len(comps)):
                scans.append((ac_refine_events(ci, lo, hi_, a + 1, a),
                              [ci], lo, hi_, a + 1, a))

    out, seg = _headers(h, w, comps, 0xC2)
    for events, scomps, ss, se, ah, pt in scans:
        events = list(events)
        freqs = {}
        for ev in events:
            if ev[0] == "sym":
                freqs.setdefault(ev[1], {})[ev[2]] = \
                    freqs.get(ev[1], {}).get(ev[2], 0) + 1
        tables = {k: _canonical(v) for k, v in freqs.items()}
        for (cls, tid), (counts, symbols, _) in sorted(tables.items()):
            seg(0xC4, bytes([(cls << 4) | tid]) + counts + symbols)
        bw_ = _BitWriter()
        for ev in events:
            if ev[0] == "sym":
                code, ln = tables[ev[1]][2][ev[2]]
                bw_.write(code, ln)
            elif ev[2]:
                bw_.write(ev[1], ev[2])
        bw_.flush()
        sos = bytes([len(scomps)])
        for ci in scomps:
            tq = tid_of[ci]
            sos += bytes([ci + 1, (tq << 4) | tq])
        sos += bytes([ss, se, (ah << 4) | pt])
        seg(0xDA, sos)
        out.extend(bw_.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
