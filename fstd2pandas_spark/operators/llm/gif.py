"""GIF (87a/89a) decoder in pure numpy + stdlib — the public spec:
logical screen descriptor, global/local color tables, LZW-compressed
image data (variable-width codes, clear/EOI, 12-bit cap), 4-pass
interlacing, and GIF89a graphic-control extensions (frame delays,
transparency, disposal) for animated GIFs.

Completes the web-image codec family beside PNG and baseline +
progressive JPEG (``multimodal.py``, ``jpeg.py``): a GIF payload
decodes to real pixels, and an ANIMATED GIF becomes a frame source for
:func:`~fstd2pandas_spark.operators.llm.multimodal.sample_video_frames`
(each sampled frame re-encoded as PPM — decodable downstream).

Same honesty contract as the other decoders: malformed or
out-of-scope payloads return ``None``; no exception ever escapes into
the mapInPandas task.
"""

from __future__ import annotations

import numpy as np

from fstd2pandas_spark.operators.llm._limits import MAX_DECODE_BYTES

#: 4-pass interlace row schedule (GIF spec appendix E)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class _BadGif(Exception):
    pass


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list:
    """GIF-flavoured LZW: LSB-first bit packing, variable code width
    from min+1 bits, CLEAR resets the table, 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader state over the concatenated sub-block bytes
    pos = 0
    acc = 0
    nbits = 0

    def read_code(width):
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[tuple] = []

    def reset_table():
        nonlocal table
        table = [(i,) for i in range(clear)] + [(), ()]

    reset_table()
    width = min_code_size + 1
    prev: "tuple | None" = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            reset_table()
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table) and code != clear:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise _BadGif("bad LZW code")
        out.extend(entry)
        if prev is not None:
            if len(table) < 4096:
                table.append(prev + (entry[0],))
                if len(table) == (1 << width) and width < 12:
                    width += 1
        prev = entry
    return out[:n_pixels]


def _sub_blocks(payload: bytes, pos: int) -> "tuple[bytes, int]":
    parts = []
    while True:
        if pos >= len(payload):
            raise _BadGif("truncated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        parts.append(payload[pos:pos + n])
        pos += n
    return b"".join(parts), pos


def parse_gif(payload: bytes):
    """Parse a GIF into (delays_ms, frames): composed full-canvas RGB
    frames honouring draw-over/restore-background disposal and
    transparency. Returns None if not a decodable GIF."""
    try:
        return _parse(payload)
    except (_BadGif, IndexError, ValueError):
        return None


def _parse(payload: bytes):
    if payload is None or len(payload) < 13 or \
            payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags, bg = payload[10], payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    if w <= 0 or h <= 0:
        return None
    # forged-dims guard BEFORE allocation: the 16-bit logical-screen
    # fields allow a 20-byte header to claim a ~13 GiB canvas
    if h * w * 3 > MAX_DECODE_BYTES:
        return None

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames = []
    delays = []
    DEFAULT_DELAY = 100  # ms assumed for frames without a GCE
    delay = DEFAULT_DELAY
    transparent = None
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gce = payload[pos + 1:pos + 1 + size]
                pos += 1 + size
                if len(gce) >= 4:
                    disposal = (gce[0] >> 2) & 0x07
                    delay = max(int.from_bytes(gce[1:3], "little") * 10,
                                10)
                    transparent = gce[3] if gce[0] & 0x01 else None
                if payload[pos] != 0:  # spec: zero terminator
                    _, pos = _sub_blocks(payload, pos)
                else:
                    pos += 1
            else:  # comment / app / plain-text: skip sub-blocks
                _, pos = _sub_blocks(payload, pos)
        elif block == 0x2C:  # image descriptor
            left = int.from_bytes(payload[pos:pos + 2], "little")
            top = int.from_bytes(payload[pos + 2:pos + 4], "little")
            fw = int.from_bytes(payload[pos + 4:pos + 6], "little")
            fh = int.from_bytes(payload[pos + 6:pos + 8], "little")
            iflags = payload[pos + 8]
            pos += 9
            # frame-bounds guard BEFORE the LZW decode: a forged
            # descriptor claiming up to 65535x65535 would otherwise
            # drive _lzw_decode toward a 4.3e9-pixel output bound while
            # the canvas check below only runs after decoding
            if fw <= 0 or fh <= 0 or top + fh > h or left + fw > w:
                raise _BadGif("frame exceeds canvas")
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(payload, np.uint8, 3 * n, pos) \
                    .reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise _BadGif("no color table")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise _BadGif("bad LZW min code size")
            data, pos = _sub_blocks(payload, pos)
            idx = np.array(_lzw_decode(min_code, data, fw * fh),
                           dtype=np.int64)
            if idx.size < fw * fh:
                raise _BadGif("short LZW stream")
            if idx.max(initial=0) >= len(table):
                raise _BadGif("index out of palette")
            grid = idx.reshape(fh, fw)
            if iflags & 0x40:  # interlaced: reorder rows
                ordered = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE:
                    rows = range(start, fh, step)
                    for r in rows:
                        ordered[r] = grid[src]
                        src += 1
                grid = ordered
            before = canvas.copy()
            region = table[grid]
            if transparent is not None:
                keep = grid == transparent
                region = np.where(keep[..., None],
                                  canvas[top:top + fh, left:left + fw],
                                  region)
            canvas[top:top + fh, left:left + fw] = region
            # cumulative-frames cap: a long animation of a large canvas
            # multiplies the budget per frame — truncate the frame list
            # (already-decoded frames stay valid), never OOM
            if (len(frames) + 1) * canvas.nbytes > MAX_DECODE_BYTES:
                break
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:  # restore to background
                bg_rgb = gct[bg] if (gct is not None and bg < len(gct)) \
                    else np.zeros(3, np.uint8)
                canvas[top:top + fh, left:left + fw] = bg_rgb
            elif disposal == 3:  # restore to previous
                canvas = before
            # a GCE applies only to the NEXT rendering block: reset
            # delay too, or a GCE-less frame inherits its predecessor's
            transparent = None
            disposal = 0
            delay = DEFAULT_DELAY
        else:
            raise _BadGif(f"unknown block 0x{block:02x}")

    if not frames:
        return None
    return delays, frames


def decode_gif(payload: bytes) -> "np.ndarray | None":
    """First (or only) frame of a GIF as (h, w, 3) uint8 RGB."""
    parsed = parse_gif(payload)
    return parsed[1][0] if parsed else None
