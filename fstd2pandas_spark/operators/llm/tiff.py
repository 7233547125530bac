"""Baseline TIFF 6.0 decoder in pure numpy + stdlib — the public spec:
II/MM byte orders, IFD tag walk, STRIP and TILED layouts (tiles are
the GeoTIFF norm: row-major full tiles, zero-padded edges assembled
clipped, per-tile predictor restart), 8- and 16-bit samples (16-bit
downscales to the high byte with the predictor applied at sample
width — the PNG depth-16 policy) in greyscale / RGB / RGBA (alpha
dropped) / palette photometrics, and the three codec-free
compressions: none (1), LZW (5, MSB-first codes with the spec's
early-change width rule + horizontal-differencing predictor) and
PackBits (32773).

Compression 7 (new-style JPEG-in-TIFF, TTN2) decodes each strip/tile
through the real JPEG decoder, splicing the optional JPEGTables (347)
abbreviated stream ahead of each chunk's scan.

Planar configuration 2 (per-component strip planes) reassembles and
stacks channels.

CCITT fax codings decode for real through
:mod:`fstd2pandas_spark.operators.llm.ccitt` (compression 2 = Modified
Huffman RLE, 3 = T.4 G3 1-D/2-D with EOLs and the byte-aligned
option, 4 = T.6 G4 MMR), strip and tiled layouts, FillOrder 2.

Compression 6 (old-style JPEG, deprecated) decodes the common
real-world shape: one complete interchange stream at
JPEGInterchangeFormat (513/514) through the real JPEG decoder.

Out-of-scope variants return ``None`` for the content-hash fallback
(planar tiled/JPEG combinations, comp-6's tag-soup variant that
rebuilds scans from tags 517-521 — mainstream writers never produced
it correctly, the reason TTN2 exists — and T.4/T.6 uncompressed
mode) — the same honesty contract as the other decoders.
"""

from __future__ import annotations

import struct

import numpy as np

from fstd2pandas_spark.operators.llm._limits import MAX_DECODE_BYTES


class _BadTiff(Exception):
    pass


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    """TIFF-flavoured LZW (spec section 13): MSB-first bit packing,
    9-bit initial codes, CLEAR=256/EOI=257, and the EARLY-CHANGE rule —
    the code width bumps when the table reaches 2^width - 1 (one code
    earlier than GIF's convention)."""
    out = bytearray()
    pos = 0
    acc = 0
    nbits = 0
    width = 9
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    prev: "bytes | None" = None
    n = len(data)
    while len(out) < max_out:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 257:  # EOI
            break
        if code == 256:  # CLEAR
            reset()
            prev = None
            continue
        if code < len(table) and code not in (256, 257):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise _BadTiff("bad LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out[:max_out])


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < max_out:
        b = data[pos]
        pos += 1
        if b < 128:                       # literal run of b+1 bytes
            out += data[pos:pos + b + 1]
            pos += b + 1
        elif b > 128:                     # repeat next byte 257-b times
            if pos < n:
                out += bytes([data[pos]]) * (257 - b)
                pos += 1
        # b == 128: no-op
    return bytes(out[:max_out])


def decode_tiff(payload: bytes) -> "np.ndarray | None":
    """Decode a baseline TIFF to (h, w, 3) uint8 RGB, or None."""
    try:
        return _decode(payload)
    except (_BadTiff, struct.error, IndexError, ValueError):
        return None


def _decode(payload: bytes) -> "np.ndarray | None":
    if payload is None or len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        end = "<"
    elif payload[:4] == b"MM\x00*":
        end = ">"
    else:
        return None
    ifd_off = struct.unpack(end + "I", payload[4:8])[0]
    n_entries = struct.unpack(end + "H", payload[ifd_off:ifd_off + 2])[0]
    tags: dict[int, tuple] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(end + "HHI",
                                        payload[e:e + 8])
        if typ not in type_size:
            continue
        total = type_size[typ] * count
        # forged-count guard BEFORE building the unpack format string:
        # count is attacker-controlled 32-bit, and `fmt_char * count`
        # materializes a multi-GiB string (uncatchable MemoryError)
        # long before any data-length check could reject the entry
        if total > len(payload):
            raise _BadTiff("tag value count exceeds file size")
        if total <= 4:
            raw = payload[e + 8:e + 8 + total]
        else:
            off = struct.unpack(end + "I", payload[e + 8:e + 12])[0]
            raw = payload[off:off + total]
        if len(raw) < total:
            raise _BadTiff("truncated tag values")
        if typ in type_fmt:
            vals = struct.unpack(end + type_fmt[typ] * count, raw)
        else:
            vals = (raw,)
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    w = one(256)
    h = one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, (8,) * spp)
    planar = one(284, 1)
    predictor = one(317, 1)
    if w is None or h is None or photo is None:
        return None
    if comp in (2, 3, 4):
        # CCITT fax codings (T.4 MH / G3 / T.6 G4): bilevel only —
        # BitsPerSample defaults to 1 for these and the spec requires
        # it; the dedicated branch below bypasses the byte-oriented
        # sample machinery entirely
        eff_bits = tags.get(258, (1,))
        if planar != 1 or spp != 1 or any(b != 1 for b in eff_bits):
            raise _BadTiff("CCITT requires bilevel planar-1")
        if h * w > MAX_DECODE_BYTES:
            raise _BadTiff("dimensions exceed decode budget")
        return _decode_ccitt_layout(payload, tags, one, h, w, comp, photo)
    if planar not in (1, 2) or any(b != bits[0] for b in bits) \
            or bits[0] not in (8, 16):
        raise _BadTiff("unsupported planar config or bit depth")
    bps = bits[0] // 8   # bytes per sample (16-bit downscales, PNG-style)
    if comp == 6:
        # old-style JPEG-in-TIFF (compression 6, deprecated by TTN2):
        # the overwhelmingly common real-world shape stores ONE
        # complete interchange-format JPEG stream at
        # JPEGInterchangeFormat (513) / ...Length (514) — decode that
        # directly. The tag-soup variant (per-strip scans rebuilt
        # from JPEGQTables/DC/ACTables 517-521) stays an honest
        # fallback: mainstream writers never produced it correctly
        # (the reason TTN2 exists).
        off6, len6 = one(513), one(514)
        if not off6 or not len6:
            raise _BadTiff("old-style JPEG without interchange stream")
        if h * w * 3 > MAX_DECODE_BYTES:
            raise _BadTiff("dimensions exceed decode budget")
        from fstd2pandas_spark.operators.llm.jpeg import decode_jpeg

        img = decode_jpeg(bytes(payload[off6:off6 + len6]))
        if img is None or img.shape[0] < h or img.shape[1] < w:
            raise _BadTiff("bad old-style JPEG stream")
        # decode_jpeg already returns RGB; clip MCU padding
        return np.ascontiguousarray(img[:h, :w])
    if comp not in (1, 5, 32773, 7):
        raise _BadTiff(f"compression {comp}")
    # forged-IFD guard BEFORE any chunk materializes: 32-bit dims tags
    # allow a small file to demand terabytes, and an LZW-bomb chunk can
    # legitimately inflate far beyond its compressed bytes toward the
    # claimed chunk size
    if h * w * spp * bps > MAX_DECODE_BYTES:
        raise _BadTiff("dimensions exceed decode budget")

    if comp == 7:
        if planar != 1:
            raise _BadTiff("planar JPEG-in-TIFF")
        # the JPEG path always materializes h*w*3 uint8 regardless of
        # the declared sample layout — budget against that, not the
        # header's spp*bps (a forged spp=1 would pass at 1/3 weight)
        if h * w * 3 > MAX_DECODE_BYTES:
            raise _BadTiff("dimensions exceed decode budget")
        # new-style JPEG-in-TIFF (TTN2): each strip/tile is a JPEG
        # stream; an optional JPEGTables tag (347) holds an abbreviated
        # tables-only stream (SOI..tables..EOI) spliced ahead of each
        # chunk's scan (chunk keeps its own SOI dropped). decode_jpeg
        # already performs the YCbCr->RGB conversion, so the photometric
        # switch below is bypassed and the assembled RGB returns as-is.
        from fstd2pandas_spark.operators.llm.jpeg import decode_jpeg

        jt = tags.get(347)
        tables = jt[0] if jt else None

        def jchunk(off, cnt, nrows, ncols):
            raw = bytes(payload[off:off + cnt])
            if tables is not None and len(tables) >= 4 \
                    and raw[:2] == b"\xff\xd8":
                raw = bytes(tables[:-2]) + raw[2:]
            img = decode_jpeg(raw)
            # a chunk must COVER its strip/tile (JPEG MCU padding may
            # make it larger, never smaller)
            if img is None or img.shape[0] < nrows \
                    or img.shape[1] < ncols:
                raise _BadTiff("bad JPEG chunk")
            return img

        px = np.zeros((h, w, 3), dtype=np.uint8)
        if 322 in tags or 323 in tags:
            tw, th = one(322), one(323)
            toffs, tcnts = tags.get(324), tags.get(325)
            if not tw or not th or tw < 1 or th < 1:
                raise _BadTiff("bad tile dimensions")
            if not toffs or not tcnts or len(toffs) != len(tcnts):
                raise _BadTiff("missing tiles")
            across, down = -(-w // tw), -(-h // th)
            if len(toffs) < across * down:
                raise _BadTiff("short tile table")
            for idx in range(across * down):
                img = jchunk(toffs[idx], tcnts[idx], th, tw)
                ty, tx = divmod(idx, across)
                y0, x0 = ty * th, tx * tw
                ch_, cw_ = min(th, h - y0), min(tw, w - x0)
                px[y0:y0 + ch_, x0:x0 + cw_] = img[:ch_, :cw_]
        else:
            offsets = tags.get(273)
            counts = tags.get(279)
            if not offsets or not counts \
                    or len(offsets) != len(counts):
                raise _BadTiff("missing strips")
            rows_per_strip = one(278, h)
            if not rows_per_strip or rows_per_strip < 1:
                raise _BadTiff("bad rows_per_strip")
            if len(offsets) < -(-h // rows_per_strip):
                raise _BadTiff("short strip table")
            y0 = 0
            for off, cnt in zip(offsets, counts):
                rows = min(rows_per_strip, h - y0)
                if rows <= 0:
                    break
                img = jchunk(off, cnt, rows, w)
                px[y0:y0 + rows] = img[:rows, :w]
                y0 += rows
        return px

    def _samples(data, nrows, ncols, nchan):
        """Decoded chunk bytes -> (nrows, ncols, nchan) uint8: 16-bit
        samples apply the predictor at sample width (per spec) then
        downscale to the high byte — the same policy as the PNG
        decoder's depth-16 path."""
        if bps == 1:
            arr = np.frombuffer(data, np.uint8,
                                nrows * ncols * nchan).reshape(
                nrows, ncols, nchan)
            if predictor == 2:            # horizontal differencing
                arr = np.cumsum(arr.astype(np.uint32), axis=1) \
                    .astype(np.uint8)
            return arr
        dt = np.dtype(np.uint16).newbyteorder(
            "<" if end == "<" else ">")
        arr = np.frombuffer(data, dt, nrows * ncols * nchan).reshape(
            nrows, ncols, nchan)
        if predictor == 2:
            arr = (np.cumsum(arr.astype(np.uint32), axis=1)
                   & 0xFFFF).astype(np.uint16)
        return (arr >> 8).astype(np.uint8)

    def chunk(off, cnt, want):
        """One decompressed strip/tile, exactly `want` bytes."""
        raw = payload[off:off + cnt]
        if comp == 1:
            data = raw[:want]
        elif comp == 5:
            data = _lzw_decode_tiff(raw, want)
        else:
            data = _packbits_decode(raw, want)
        if len(data) < want:
            raise _BadTiff("short chunk")
        return data

    if 322 in tags or 323 in tags:
        if planar != 1:
            raise _BadTiff("planar tiled TIFF")
        # tiled layout (the GeoTIFF norm): full tw x th tiles in
        # row-major tile order, edge tiles padded — assemble clipped.
        # Each tile decompresses independently; the horizontal
        # predictor restarts per tile row, exactly the strip rule
        # applied to the tile's own width.
        tw, th = one(322), one(323)
        toffs, tcnts = tags.get(324), tags.get(325)
        if not tw or not th or tw < 1 or th < 1:
            raise _BadTiff("bad tile dimensions")
        if not toffs or not tcnts or len(toffs) != len(tcnts):
            raise _BadTiff("missing tiles")
        across = -(-w // tw)
        down = -(-h // th)
        if len(toffs) < across * down:
            raise _BadTiff("short tile table")
        if th * tw * spp * bps > MAX_DECODE_BYTES:
            raise _BadTiff("tile exceeds decode budget")
        px = np.zeros((h, w, spp), dtype=np.uint8)
        want = th * tw * spp * bps
        for idx in range(across * down):
            data = chunk(toffs[idx], tcnts[idx], want)
            arr = _samples(data, th, tw, spp)
            ty, tx = divmod(idx, across)
            y0, x0 = ty * th, tx * tw
            ch_, cw_ = min(th, h - y0), min(tw, w - x0)
            px[y0:y0 + ch_, x0:x0 + cw_] = arr[:ch_, :cw_]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise _BadTiff("missing strips")
        rows_per_strip = one(278, h)
        if not rows_per_strip or rows_per_strip < 1:
            raise _BadTiff("bad rows_per_strip")
        # planar config 2: the strip table holds each component's
        # strips consecutively (all of channel 0, then channel 1, ...),
        # one sample per pixel per chunk; planes assemble then stack
        spp_eff = 1 if planar == 2 else spp
        per_plane = -(-h // rows_per_strip)
        n_planes = spp if planar == 2 else 1
        if planar == 2 and len(offsets) < per_plane * spp:
            raise _BadTiff("short planar strip table")
        planes = []
        for pl in range(n_planes):
            parts = []
            remaining_rows = h
            for i in range(per_plane if planar == 2 else len(offsets)):
                idx = pl * per_plane + i
                strip_rows = min(rows_per_strip, remaining_rows)
                remaining_rows -= strip_rows
                want = strip_rows * w * spp_eff * bps
                data = chunk(offsets[idx], counts[idx], want)
                parts.append(_samples(data, strip_rows, w, spp_eff))
            planes.append(np.concatenate(parts, axis=0))
        px = planes[0] if n_planes == 1 else np.concatenate(
            planes, axis=2)

    return _apply_photometric(px, photo, spp, tags)


def _decode_ccitt_layout(payload, tags, one, h, w, comp, photo):
    """Strip/tiled CCITT assembly (compressions 2/3/4): each chunk is
    an independently coded fax block decoded by
    :mod:`fstd2pandas_spark.operators.llm.ccitt`; rows come back as
    0=white / 1=black bits, scaled to 8-bit before the photometric
    switch (white-is-zero renders white as 255 like any grey image)."""
    from fstd2pandas_spark.operators.llm.ccitt import (
        _BadCcitt, decode_ccitt)

    t4o = one(292, 0)
    t6o = one(293, 0)
    fill = one(266, 1)

    def block(off, cnt, nrows, ncols):
        try:
            return decode_ccitt(bytes(payload[off:off + cnt]), ncols,
                                nrows, comp, t4o, t6o, fill)
        except _BadCcitt as exc:
            raise _BadTiff(f"CCITT: {exc}")

    if 322 in tags or 323 in tags:
        tw, th = one(322), one(323)
        toffs, tcnts = tags.get(324), tags.get(325)
        if not tw or not th or tw < 1 or th < 1:
            raise _BadTiff("bad tile dimensions")
        if not toffs or not tcnts or len(toffs) != len(tcnts):
            raise _BadTiff("missing tiles")
        across, down = -(-w // tw), -(-h // th)
        if len(toffs) < across * down:
            raise _BadTiff("short tile table")
        # forged tile dims can dwarf the (already budget-checked) h*w:
        # each tile materializes th*tw bytes regardless of the image
        # area it lands on — same guard as the baseline tiled path
        if th * tw > MAX_DECODE_BYTES:
            raise _BadTiff("tile exceeds decode budget")
        bitsimg = np.zeros((h, w), dtype=np.uint8)
        for idx in range(across * down):
            arr = block(toffs[idx], tcnts[idx], th, tw)
            ty, tx = divmod(idx, across)
            y0, x0 = ty * th, tx * tw
            ch_, cw_ = min(th, h - y0), min(tw, w - x0)
            bitsimg[y0:y0 + ch_, x0:x0 + cw_] = arr[:ch_, :cw_]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise _BadTiff("missing strips")
        rows_per_strip = one(278, h)
        if not rows_per_strip or rows_per_strip < 1:
            raise _BadTiff("bad rows_per_strip")
        if len(offsets) < -(-h // rows_per_strip):
            raise _BadTiff("short strip table")
        parts = []
        y0 = 0
        for off, cnt in zip(offsets, counts):
            rows = min(rows_per_strip, h - y0)
            if rows <= 0:
                break
            parts.append(block(off, cnt, rows, w))
            y0 += rows
        bitsimg = np.concatenate(parts, axis=0)
    px = (bitsimg * np.uint8(255))[..., None]
    return _apply_photometric(px, photo, 1, tags)


def _apply_photometric(px, photo, spp, tags):
    if photo in (0, 1) and spp >= 1:      # grey (0 = white-is-zero)
        g = px[..., 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[..., None], 3, axis=2)
    if photo == 2 and spp >= 3:           # RGB / RGBA (alpha dropped)
        return np.ascontiguousarray(px[..., :3])
    if photo == 3:                        # palette: 16-bit colormap
        cmap = tags.get(320)
        if not cmap:
            raise _BadTiff("palette without colormap")
        cm = np.asarray(cmap, dtype=np.uint32)
        if cm.size < 3 * 256:
            raise _BadTiff("short colormap")
        lut = (cm[:3 * 256].reshape(3, 256).T >> 8).astype(np.uint8)
        return lut[px[..., 0]]
    raise _BadTiff(f"photometric {photo}/spp {spp}")
