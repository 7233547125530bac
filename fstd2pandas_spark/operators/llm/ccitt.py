"""CCITT Group 3 / Group 4 fax decoding (ITU-T T.4 / T.6 — fully
published standards, unlike the librmn pack streams) for the TIFF
compressions 2 (Modified Huffman RLE, byte-aligned lines), 3 (T.4 G3,
1-D and 2-D with EOLs) and 4 (T.6 G4 MMR, pure 2-D).

Structure:
- the T.4 run-length Huffman tables (white/black terminating codes
  0-63, makeup codes 64-1728, shared extended makeups 1792-2560),
  written from the published T.4 tables; the decoder builds prefix
  maps from the SAME literal table the test encoder consumes, so a
  transcription slip cannot be caught by round-trip alone — the test
  suite therefore also pins a handful of spot codewords and asserts
  the prefix-free property over the whole table;
- a 1-D line decoder (alternating white/black runs, first run white,
  zero-length white run legal, runs must sum exactly to the row
  width);
- the T.4/T.6 2-D line decoder (pass / horizontal / vertical modes
  against the reference line's changing elements, the published
  a0/b1/b2 algorithm);
- :func:`decode_ccitt` dispatching per compression, handling EOL
  scanning with fill bits (G3), the optional byte-aligned-EOL option,
  1-D/2-D tag bits (G3 2-D), the all-white imaginary reference line
  and optional EOFB (G4), and FillOrder 2 (LSB-first bit order,
  tag 266) via per-byte bit reversal.

Rows decode to uint8 arrays with the CCITT coding sense: 0 = "white"
(the colour runs start in), 1 = "black"; the TIFF layer scales and
applies the photometric interpretation. Errors raise
:class:`_BadCcitt` — the TIFF layer maps it to the honest None
fallback.

Scale note: this runs inside the Arrow-batched multimodal kernel
(mapInPandas) like the other codecs — per-document work, no shuffle
interaction; a corrupt stream raises before materializing more than
the declared (rows x width) bits.

Uncompressed mode (t4_options/t6_options bit 1) stays a deliberate
loud raise, adjudicated like the librmn pack streams (round 8): the
mode's entry code and literal codes are well known, but the exact
trailing-zero exit-code family is not reproducible from material
available here, and no mainstream writer has ever emitted the mode
(libtiff's own encoder never sets it) — a from-memory implementation
would claim compatibility nothing could test. The raise maps to the
honest None fallback, never garbage.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.4 code tables: (run_length, bit_string)
# ---------------------------------------------------------------------------

_WHITE_CODES = [
    (0, "00110101"), (1, "000111"), (2, "0111"), (3, "1000"),
    (4, "1011"), (5, "1100"), (6, "1110"), (7, "1111"),
    (8, "10011"), (9, "10100"), (10, "00111"), (11, "01000"),
    (12, "001000"), (13, "000011"), (14, "110100"), (15, "110101"),
    (16, "101010"), (17, "101011"), (18, "0100111"), (19, "0001100"),
    (20, "0001000"), (21, "0010111"), (22, "0000011"), (23, "0000100"),
    (24, "0101000"), (25, "0101011"), (26, "0010011"), (27, "0100100"),
    (28, "0011000"), (29, "00000010"), (30, "00000011"),
    (31, "00011010"), (32, "00011011"), (33, "00010010"),
    (34, "00010011"), (35, "00010100"), (36, "00010101"),
    (37, "00010110"), (38, "00010111"), (39, "00101000"),
    (40, "00101001"), (41, "00101010"), (42, "00101011"),
    (43, "00101100"), (44, "00101101"), (45, "00000100"),
    (46, "00000101"), (47, "00001010"), (48, "00001011"),
    (49, "01010010"), (50, "01010011"), (51, "01010100"),
    (52, "01010101"), (53, "00100100"), (54, "00100101"),
    (55, "01011000"), (56, "01011001"), (57, "01011010"),
    (58, "01011011"), (59, "01001010"), (60, "01001011"),
    (61, "00110010"), (62, "00110011"), (63, "00110100"),
    # makeup codes
    (64, "11011"), (128, "10010"), (192, "010111"), (256, "0110111"),
    (320, "00110110"), (384, "00110111"), (448, "01100100"),
    (512, "01100101"), (576, "01101000"), (640, "01100111"),
    (704, "011001100"), (768, "011001101"), (832, "011010010"),
    (896, "011010011"), (960, "011010100"), (1024, "011010101"),
    (1088, "011010110"), (1152, "011010111"), (1216, "011011000"),
    (1280, "011011001"), (1344, "011011010"), (1408, "011011011"),
    (1472, "010011000"), (1536, "010011001"), (1600, "010011010"),
    (1664, "011000"), (1728, "010011011"),
]

_BLACK_CODES = [
    (0, "0000110111"), (1, "010"), (2, "11"), (3, "10"),
    (4, "011"), (5, "0011"), (6, "0010"), (7, "00011"),
    (8, "000101"), (9, "000100"), (10, "0000100"), (11, "0000101"),
    (12, "0000111"), (13, "00000100"), (14, "00000111"),
    (15, "000011000"), (16, "0000010111"), (17, "0000011000"),
    (18, "0000001000"), (19, "00001100111"), (20, "00001101000"),
    (21, "00001101100"), (22, "00000110111"), (23, "00000101000"),
    (24, "00000010111"), (25, "00000011000"), (26, "000011001010"),
    (27, "000011001011"), (28, "000011001100"), (29, "000011001101"),
    (30, "000001101000"), (31, "000001101001"), (32, "000001101010"),
    (33, "000001101011"), (34, "000011010010"), (35, "000011010011"),
    (36, "000011010100"), (37, "000011010101"), (38, "000011010110"),
    (39, "000011010111"), (40, "000001101100"), (41, "000001101101"),
    (42, "000011011010"), (43, "000011011011"), (44, "000001010100"),
    (45, "000001010101"), (46, "000001010110"), (47, "000001010111"),
    (48, "000001100100"), (49, "000001100101"), (50, "000001010010"),
    (51, "000001010011"), (52, "000000100100"), (53, "000000110111"),
    (54, "000000111000"), (55, "000000100111"), (56, "000000101000"),
    (57, "000001011000"), (58, "000001011001"), (59, "000000101011"),
    (60, "000000101100"), (61, "000001011010"), (62, "000001100110"),
    (63, "000001100111"),
    # makeup codes
    (64, "0000001111"), (128, "000011001000"), (192, "000011001001"),
    (256, "000001011011"), (320, "000000110011"), (384, "000000110100"),
    (448, "000000110101"), (512, "0000001101100"),
    (576, "0000001101101"), (640, "0000001001010"),
    (704, "0000001001011"), (768, "0000001001100"),
    (832, "0000001001101"), (896, "0000001110010"),
    (960, "0000001110011"), (1024, "0000001110100"),
    (1088, "0000001110101"), (1152, "0000001110110"),
    (1216, "0000001110111"), (1280, "0000001010010"),
    (1344, "0000001010011"), (1408, "0000001010100"),
    (1472, "0000001010101"), (1536, "0000001011010"),
    (1600, "0000001011011"), (1664, "0000001100100"),
    (1728, "0000001100101"),
]

#: extended makeup codes shared by both colours (runs 1792-2560)
_EXT_CODES = [
    (1792, "00000001000"), (1856, "00000001100"), (1920, "00000001101"),
    (1984, "000000010010"), (2048, "000000010011"),
    (2112, "000000010100"), (2176, "000000010101"),
    (2240, "000000010110"), (2304, "000000010111"),
    (2368, "000000011100"), (2432, "000000011101"),
    (2496, "000000011110"), (2560, "000000011111"),
]

#: 2-D mode codes (T.4 section 4.2.1.3 / T.6): pass, horizontal,
#: vertical 0/±1/±2/±3
_MODE_CODES = [
    ("P", "0001"), ("H", "001"), ("V0", "1"),
    ("VR1", "011"), ("VR2", "000011"), ("VR3", "0000011"),
    ("VL1", "010"), ("VL2", "000010"), ("VL3", "0000010"),
]

_EOL = "000000000001"


class _BadCcitt(Exception):
    pass


def _prefix_map(codes) -> dict:
    """(nbits, value) -> payload map; validates the code set is
    prefix-free (a transcription slip collides here immediately)."""
    m: dict = {}
    for payload, bits in codes:
        key = (len(bits), int(bits, 2))
        if key in m:
            raise ValueError(f"duplicate code {bits}")
        m[key] = payload
    # prefix-free check: no code may be a prefix of another
    by_str = [bits for _, bits in codes]
    ss = set(by_str)
    for bits in by_str:
        for k in range(1, len(bits)):
            if bits[:k] in ss:
                raise ValueError(f"{bits[:k]} is a prefix of {bits}")
    return m


_WHITE_MAP = _prefix_map(_WHITE_CODES + _EXT_CODES)
_BLACK_MAP = _prefix_map(_BLACK_CODES + _EXT_CODES)
_MODE_MAP = _prefix_map([(m, b) for m, b in _MODE_CODES])

#: longest codeword per table (bounded lookahead in the decoders)
_MAX_WHITE = max(len(b) for _, b in _WHITE_CODES + _EXT_CODES)
_MAX_BLACK = max(len(b) for _, b in _BLACK_CODES + _EXT_CODES)
_MAX_MODE = max(len(b) for _, b in _MODE_CODES)

#: per-byte bit reversal for FillOrder 2 (LSB-first files)
_BITREV = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))


class _Bits:
    """MSB-first bit reader over a bytes payload."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0                    # bit index
        self.n = len(data) * 8

    def read1(self) -> int:
        if self.pos >= self.n:
            raise _BadCcitt("bit overrun")
        b = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 0) -> bool:
        return self.pos + slack_bits >= self.n


def _read_code(bits: _Bits, table: dict, max_len: int, what: str):
    """One prefix codeword via the (nbits, value) map."""
    acc = 0
    for k in range(1, max_len + 1):
        acc = (acc << 1) | bits.read1()
        hit = table.get((k, acc))
        if hit is not None:
            return hit
    raise _BadCcitt(f"bad {what} code")


def _read_run(bits: _Bits, color: int) -> int:
    """A full run length: zero or more makeup codes then one
    terminating code (T.4: one makeup + one terminating; chained max
    makeups extend runs past 2560)."""
    table = _BLACK_MAP if color else _WHITE_MAP
    max_len = _MAX_BLACK if color else _MAX_WHITE
    total = 0
    for _ in range(64):                  # bounded: no stream needs more
        v = _read_code(bits, table, max_len, "black" if color else "white")
        total += v
        if v < 64:
            return total
    raise _BadCcitt("runaway makeup chain")


def _decode_1d_line(bits: _Bits, width: int) -> np.ndarray:
    """One MH-coded line -> uint8 row (0 = white, 1 = black). Runs
    alternate starting white and must sum exactly to the width."""
    row = np.zeros(width, dtype=np.uint8)
    pos = 0
    color = 0
    while pos < width:
        run = _read_run(bits, color)
        if pos + run > width:
            raise _BadCcitt("run past line end")
        if color:
            row[pos:pos + run] = 1
        pos += run
        color ^= 1
    return row


def _changes_of(row: np.ndarray) -> list:
    """Changing-element positions of a row: indices where the colour
    differs from the pixel to the left (imaginary white before the
    line). Index parity encodes the new colour for a line starting
    white: even index -> black begins, odd -> white begins."""
    prev = np.concatenate(([0], row[:-1]))
    return np.nonzero(row != prev)[0].tolist()


def _decode_2d_line(bits: _Bits, width: int, ref: list) -> np.ndarray:
    """One 2-D coded line against the reference line's changing
    elements (the T.4/T.6 a0/b1/b2 algorithm)."""
    cur: list = []
    a0 = -1                              # imaginary white pixel at -1
    color = 0
    while True:
        # b1: first changing element of ref to the right of a0 whose
        # new colour is the opposite of the current colour; b2: the
        # next change after b1
        i = 0
        nref = len(ref)
        while i < nref and (ref[i] <= a0 or (i & 1) != color):
            # (i & 1) == color means ref[i] starts colour `1 - parity`…
            # spelled out: even i begins black; we need a change that
            # begins !color, i.e. parity == color
            i += 1
        b1 = ref[i] if i < nref else width
        b2 = ref[i + 1] if i + 1 < nref else width
        mode = _read_code(bits, _MODE_MAP, _MAX_MODE, "mode")
        if mode == "P":                  # pass: a0 jumps under b2
            a0 = b2
        elif mode == "H":                # horizontal: two explicit runs
            base = a0 if a0 > 0 else 0
            r1 = _read_run(bits, color)
            r2 = _read_run(bits, 1 - color)
            a1 = base + r1
            a2 = a1 + r2
            if a2 > width or a1 > width:
                raise _BadCcitt("horizontal run past line end")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:                            # vertical: a1 near b1
            d = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                 "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + d
            if a1 < 0 or a1 > width:
                raise _BadCcitt("vertical move past line end")
            cur.append(a1)
            a0 = a1
            color ^= 1
        if a0 >= width:
            break
    # changes -> pixels
    row = np.zeros(width, dtype=np.uint8)
    c = 0
    prevpos = 0
    for pos in cur:
        if pos < prevpos:
            raise _BadCcitt("non-monotone changing elements")
        if c:
            row[prevpos:pos] = 1
        prevpos = pos
        c ^= 1
    if c and prevpos < width:
        row[prevpos:width] = 1
    return row


def _skip_eol(bits: _Bits, required: bool) -> bool:
    """Scan fill zeros up to an EOL (11 zeros + 1). Returns True when
    an EOL was consumed; with ``required`` False, a missing EOL rolls
    the reader back and returns False."""
    start = bits.pos
    zeros = 0
    try:
        while True:
            b = bits.read1()
            if b == 1:
                if zeros >= 11:
                    return True
                if required:
                    raise _BadCcitt("expected EOL")
                bits.pos = start
                return False
            zeros += 1
            if zeros > 64 + 11:          # fill is bounded in practice
                raise _BadCcitt("runaway EOL fill")
    except _BadCcitt:
        if required:
            raise
        bits.pos = start
        return False


def decode_ccitt(data: bytes, width: int, height: int, compression: int,
                 t4_options: int = 0, t6_options: int = 0,
                 fill_order: int = 1) -> np.ndarray:
    """Decode one CCITT-coded TIFF strip/tile to (height, width) uint8
    (0 = white, 1 = black). ``compression``: 2 = MH RLE (byte-aligned
    lines, no EOL), 3 = T.4 G3 (EOLs; 2-D when t4_options bit 0;
    byte-aligned EOLs when bit 2), 4 = T.6 G4 (pure 2-D, imaginary
    all-white reference, optional EOFB). Uncompressed mode (t4 bit 1 /
    t6 bit 1) is not produced by mainstream writers and raises."""
    if width < 1 or height < 1:
        raise _BadCcitt("bad dimensions")
    if compression not in (2, 3, 4):
        raise _BadCcitt(f"not a CCITT compression: {compression}")
    if compression == 3 and t4_options & 2:
        raise _BadCcitt("T.4 uncompressed mode unsupported")
    if compression == 4 and t6_options & 2:
        raise _BadCcitt("T.6 uncompressed mode unsupported")
    if fill_order == 2:
        data = data.translate(_BITREV)
    elif fill_order != 1:
        raise _BadCcitt(f"bad FillOrder {fill_order}")
    bits = _Bits(data)
    rows = []

    if compression == 2:                 # Modified Huffman RLE
        for _ in range(height):
            bits.align_byte()
            rows.append(_decode_1d_line(bits, width))
    elif compression == 4:               # T.6 MMR
        ref = []                         # imaginary all-white line
        for _ in range(height):
            row = _decode_2d_line(bits, width, ref)
            rows.append(row)
            ref = _changes_of(row)
        # optional EOFB (two EOLs) + padding follow; nothing to check
    else:                                # T.4 G3
        two_d = bool(t4_options & 1)
        # byte-aligned-EOL option (t4_options bit 2) needs no special
        # handling on decode: the fill bits are zeros and the EOL scan
        # consumes any run of them before the terminating 1
        ref: list = []
        for r in range(height):
            # first line may or may not be preceded by an EOL (both
            # are seen in the wild); later lines require one. No white
            # codeword carries 11+ leading zeros, so a missing leading
            # EOL cannot be confused with line data
            _skip_eol(bits, required=(r > 0))
            if two_d:
                tag = bits.read1()
                row = (_decode_1d_line(bits, width) if tag
                       else _decode_2d_line(bits, width, ref))
            else:
                row = _decode_1d_line(bits, width)
            rows.append(row)
            ref = _changes_of(row)
    return np.stack(rows)
