"""Minimal TIFF ENCODER — test scaffolding: little-endian baseline
TIFF with none/LZW/PackBits compression, optional horizontal-predictor,
grey / RGB / RGBA / palette photometrics, multi-strip layout."""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode_tiff(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)  # CLEAR
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        if next_code < 4094:
            table[cand] = next_code
            next_code += 1
            # TIFF early change: one code earlier than GIF — mirrors
            # the decoder's len(table) == 2^width - 1 rule (the decoder
            # runs one table entry behind the encoder)
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix])
    emit(257)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while i < n and (i + 1 >= n or data[i] != data[i + 1]) \
                and i - lit_start < 128:
            i += 1
        lit = data[lit_start:i]
        out.append(len(lit) - 1)
        out += lit
    return bytes(out)


def encode_tiff(img: np.ndarray, photometric: int = 2,
                compression: int = 1, predictor: int = 1,
                rows_per_strip: "int | None" = None,
                palette: "np.ndarray | None" = None,
                planar: int = 1,
                tile: "tuple[int, int] | None" = None,
                bit_depth: int = 8,
                jpeg_tables: "bytes | None" = None,
                jpeg_split_tables: bool = False,
                t4_options: int = 0,
                fill_order: int = 1) -> bytes:
    """img: (h, w) indices/grey for photometric 0/1/3, (h, w, ch) for
    RGB(A). Little-endian, one IFD. ``tile=(tw, th)`` writes the tiled
    layout (tags 322/323/324/325, row-major full tiles, zero-padded
    edges) instead of strips."""
    if img.ndim == 2:
        px = img[..., None]
    else:
        px = img
    h, w, spp = px.shape
    rows_per_strip = rows_per_strip or h

    def _pack(raw):
        if compression == 5:
            return _lzw_encode_tiff(raw)
        if compression == 32773:
            return _packbits_encode(raw)
        return raw

    def _pack_block(block):
        """Chunk bytes for one strip/tile: raw codecs pack the
        predictor-differenced samples; compression 7 (new-style
        JPEG-in-TIFF) encodes the RGB block as its own JPEG stream."""
        if compression in (2, 3, 4):
            # CCITT fax: block is (rows, cols, 1) of 0/1 bits
            from _ccitt_ref import encode_ccitt
            data = encode_ccitt(block[:, :, 0].astype(np.uint8),
                                compression, t4_options)
            if fill_order == 2:          # LSB-first files: reverse bits
                data = data.translate(bytes(
                    int(f"{i:08b}"[::-1], 2) for i in range(256)))
            return data
        if compression == 6:
            # old-style JPEG: one complete interchange stream, pointed
            # at by tags 513/514 (set after offsets resolve)
            from _jpeg_ref import encode_jpeg
            return encode_jpeg(np.ascontiguousarray(block))
        if compression == 7:
            from _jpeg_ref import encode_jpeg
            stream = encode_jpeg(np.ascontiguousarray(block))
            if jpeg_split_tables:
                # TTN2 abbreviated streams: DQT/DHT move to the
                # JPEGTables tag, strips keep SOI + frame/scan
                segs, i = [], 2
                while i + 4 <= len(stream):
                    m = stream[i:i + 2]
                    if m == b"\xff\xda":
                        segs.append((m, stream[i:]))
                        break
                    ln = struct.unpack(">H", stream[i + 2:i + 4])[0]
                    segs.append((m, stream[i:i + 2 + ln]))
                    i += 2 + ln
                tabs = b"".join(x for m, x in segs
                                if m in (b"\xff\xdb", b"\xff\xc4"))
                rest = b"".join(x for m, x in segs
                                if m not in (b"\xff\xdb", b"\xff\xc4"))
                _split_tables.append(b"\xff\xd8" + tabs + b"\xff\xd9")
                return b"\xff\xd8" + rest
            return stream
        return _pack(_pred(block).tobytes())

    sdtype = np.uint8 if bit_depth in (1, 8) else np.dtype("<u2")
    wdtype = np.int16 if bit_depth == 8 else np.int32

    def _pred(block):
        if predictor != 2:
            return block
        # first column stays raw; the rest are left-differences at
        # SAMPLE width (16-bit predictor differences 16-bit values)
        return np.diff(block.astype(wdtype), axis=1,
                       prepend=np.zeros((block.shape[0], 1,
                                         block.shape[2]),
                                        dtype=wdtype)).astype(sdtype)

    strips = []
    _split_tables = []
    if tile is not None:
        tw, th = tile
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                t = np.zeros((th, tw, spp), dtype=sdtype)
                blk = px[y0:y0 + th, x0:x0 + tw].astype(sdtype)
                t[:blk.shape[0], :blk.shape[1]] = blk
                strips.append(_pack_block(t))
    elif planar == 2:
        # per-component planes: all of channel 0's strips, then 1, ...
        for c in range(spp):
            for y0 in range(0, h, rows_per_strip):
                rows = px[y0:y0 + rows_per_strip, :, c:c + 1] \
                    .astype(sdtype)
                strips.append(_pack_block(rows))
    else:
        for y0 in range(0, h, rows_per_strip):
            rows = px[y0:y0 + rows_per_strip].astype(sdtype)
            strips.append(_pack_block(rows))

    n_strips = len(strips)
    entries = []  # (tag, type, count, value_or_bytes)

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [bit_depth] * spp)
    entry(259, 3, [compression])
    entry(262, 3, [photometric])
    entry(277, 3, [spp])
    if tile is not None:
        entry(322, 4, [tile[0]])
        entry(323, 4, [tile[1]])
    else:
        entry(278, 4, [rows_per_strip])
    entry(284, 3, [planar])
    if predictor != 1:
        entry(317, 3, [predictor])
    if compression == 3 and t4_options:
        entry(292, 4, [t4_options])
    if fill_order == 2:
        entry(266, 3, [2])
    if compression == 6:
        # placeholders; rewritten to strip 0's resolved offset below
        entry(513, 4, [0])
        entry(514, 4, [0])
    if jpeg_split_tables and _split_tables:
        # TTN2 contract: every strip/tile must share ONE table set —
        # _jpeg_ref builds content-adaptive Huffman tables, so callers
        # must feed chunks with identical statistics (e.g. tiled
        # repeats); a silent mismatch would decode garbage
        if any(t != _split_tables[0] for t in _split_tables[1:]):
            raise ValueError("jpeg_split_tables: chunks produced "
                             "different table sets")
        jpeg_tables = _split_tables[0]
    if jpeg_tables is not None:
        entry(347, 7, [jpeg_tables])
    if palette is not None:
        pal16 = np.zeros((3, 256), dtype=np.uint16)
        pal16[:, :palette.shape[0]] = \
            (palette.T.astype(np.uint16) << 8) | palette.T
        entry(320, 3, list(pal16.reshape(-1)))

    # layout: header(8) + IFD + extra-data area + strip bytes.
    # Sizes are all computable up front (inline-vs-external is decided
    # by count alone), so offsets resolve in one pass.
    fmt = {1: "B", 3: "H", 4: "I"}
    type_size = {1: 1, 3: 2, 4: 4, 7: 1}

    def pack_vals(typ, vals):
        if typ == 7:                      # UNDEFINED: raw bytes
            return vals[0]
        return struct.pack("<" + fmt[typ] * len(vals), *vals)

    counts = [len(st) for st in strips]
    n_strips = len(strips)
    off_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
    all_entries = entries + [(off_tag, 4, [0] * n_strips),
                             (cnt_tag, 4, counts)]
    n_ifd = len(all_entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_ifd + 4

    def n_vals(typ, vals):
        # type 7 (UNDEFINED): count is the raw byte length
        return len(vals[0]) if typ == 7 else len(vals)

    # first pass: compute the extra-area size
    extra_size = 0
    for tag, typ, vals in all_entries:
        total = type_size[typ] * n_vals(typ, vals)
        if total > 4:
            extra_size += total
    strips_base = data_off + extra_size
    pos = strips_base
    offsets = []
    for st in strips:
        offsets.append(pos)
        pos += len(st)
    def _resolve(tag, typ, vals):
        if tag == off_tag:
            return (tag, typ, offsets)
        if compression == 6 and tag == 513:
            return (tag, typ, [offsets[0]])
        if compression == 6 and tag == 514:
            return (tag, typ, [counts[0]])
        return (tag, typ, vals)

    all_entries = [_resolve(*e) for e in all_entries]

    # second pass: emit
    extra = bytearray()
    fields = []
    for tag, typ, vals in sorted(all_entries):
        raw = pack_vals(typ, vals)
        if len(raw) <= 4:
            fields.append((tag, typ, n_vals(typ, vals),
                           raw.ljust(4, b"\x00")))
        else:
            fields.append((tag, typ, n_vals(typ, vals),
                           struct.pack("<I", data_off + len(extra))))
            extra += raw
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(fields))
    for tag, typ, cnt, val in fields:
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)
    out += extra
    for st in strips:
        out += st
    return bytes(out)
