"""Minimal GIF ENCODER — test scaffolding for the library decoder:
GIF89a with global/local color tables, LZW compression (variable code
width, CLEAR handling), optional 4-pass interlacing, and animation
(per-frame graphic-control extensions: delay, disposal, transparency).
"""

from __future__ import annotations

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, width):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


def _lzw_encode(min_code_size, indices):
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    prefix = ()
    for px in indices:
        cand = prefix + (int(px),)
        if cand in table:
            prefix = cand
            continue
        bw.write(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = (int(px),)
    if prefix:
        bw.write(table[prefix], width)
    bw.write(eoi, width)
    bw.flush()
    return bytes(bw.out)


def _blocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _color_table_bits(n_colors):
    bits = 1
    while (2 << bits - 1) < n_colors:
        bits += 1
    return bits  # table holds 2^bits entries


def encode_gif(frames, palette, delays_cs=None, interlace=False,
               transparent=None, disposals=None, offsets=None,
               canvas=None, bg=0):
    """frames: list of 2-D index arrays; palette: (n, 3) uint8.
    delays_cs in 1/100 s; offsets: per-frame (left, top)."""
    pal = np.asarray(palette, dtype=np.uint8)
    bits = _color_table_bits(len(pal))
    size = 2 << (bits - 1)
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:len(pal)] = pal
    h0, w0 = (canvas if canvas is not None
              else (frames[0].shape[0], frames[0].shape[1]))

    out = bytearray(b"GIF89a")
    out += int(w0).to_bytes(2, "little") + int(h0).to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # global table present
    out.append(bg)
    out.append(0)  # aspect
    out += table.tobytes()

    min_code = max(2, bits)
    for fi, frame in enumerate(frames):
        fh, fw = frame.shape
        left, top = (offsets[fi] if offsets else (0, 0))
        frame_delay = delays_cs[fi] if delays_cs is not None else None
        if frame_delay is not None or transparent is not None:
            gce = bytearray([0x21, 0xF9, 4])
            disp = (disposals[fi] if disposals else 1) << 2
            tflag = 1 if transparent is not None else 0
            gce.append(disp | tflag)
            gce += int(frame_delay or 0).to_bytes(2, "little")
            gce.append(transparent if transparent is not None else 0)
            gce.append(0)
            out += gce
        out.append(0x2C)
        out += int(left).to_bytes(2, "little")
        out += int(top).to_bytes(2, "little")
        out += int(fw).to_bytes(2, "little")
        out += int(fh).to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        rows = frame
        if interlace:
            order = []
            for start, step in _INTERLACE:
                order.extend(range(start, fh, step))
            rows = frame[np.array(order)]
        out.append(min_code)
        out += _blocks(_lzw_encode(min_code, rows.reshape(-1)))
    out.append(0x3B)
    return bytes(out)
