"""CCITT T.4/T.6 ENCODER — test scaffolding for the fax decoder.

Shares the literal T.4 code TABLES with the production decoder (they
are the published standard's tables; an independent transcription
would only re-type the same rows), but the 2-D mode SELECTION logic
(pass / vertical / horizontal against the reference line) and the run
splitting are written independently from the decoder's reconstruction
— an algorithmic misunderstanding on either side breaks the
round-trip, which is the verification the tables alone cannot give.
"""

from __future__ import annotations

import numpy as np

from fstd2pandas_spark.operators.llm.ccitt import (
    _BLACK_CODES, _EOL, _EXT_CODES, _MODE_CODES, _WHITE_CODES,
)

_W = {run: bits for run, bits in _WHITE_CODES + _EXT_CODES}
_B = {run: bits for run, bits in _BLACK_CODES + _EXT_CODES}
_M = {mode: bits for mode, bits in _MODE_CODES}


class _BitW:
    def __init__(self):
        self.parts: list[str] = []
        self.nbits = 0

    def put(self, s: str) -> None:
        self.parts.append(s)
        self.nbits += len(s)

    def align(self) -> None:
        pad = (-self.nbits) % 8
        if pad:
            self.put("0" * pad)

    def pad_for_eol(self, extra: int = 0) -> None:
        """Zero-fill so that an EOL written next (plus ``extra``
        following bits, e.g. the 2-D tag bit) ends on a byte
        boundary — the T.4 byte-aligned-EOL option."""
        pad = (-(self.nbits + len(_EOL) + extra)) % 8
        if pad:
            self.put("0" * pad)

    def tobytes(self) -> bytes:
        s = "".join(self.parts)
        s += "0" * ((-len(s)) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _put_run(w: _BitW, run: int, color: int) -> None:
    table = _B if color else _W
    while run > 2560 + 63:
        w.put(table[2560])
        run -= 2560
    if run >= 64:
        w.put(table[run - run % 64])
        run %= 64
    w.put(table[run])


def _put_1d_line(w: _BitW, row: np.ndarray) -> None:
    color = 0
    pos = 0
    n = len(row)
    while pos < n:
        end = pos
        while end < n and row[end] == color:
            end += 1
        _put_run(w, end - pos, color)
        pos = end
        color ^= 1


def _changes_of(row: np.ndarray) -> list:
    prev = np.concatenate(([0], row[:-1]))
    return np.nonzero(row != prev)[0].tolist()


def _put_2d_line(w: _BitW, row: np.ndarray, ref: list) -> None:
    """Encode one line in 2-D mode against the reference line's
    changing elements: prefer pass when b2 < a1, vertical when
    |a1 - b1| <= 3, horizontal otherwise."""
    width = len(row)
    cur = _changes_of(row)
    a0 = -1
    color = 0
    while a0 < width:
        # a1/a2: next changing elements on the coding line after a0
        nxt = [p for p in cur if p > a0]
        a1 = nxt[0] if nxt else width
        a2 = nxt[1] if len(nxt) > 1 else width
        # b1: first ref change > a0 beginning the opposite colour
        # (even index begins black); b2: the change after it
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        if b2 < a1:
            w.put(_M["P"])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            w.put(_M[{0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                      -1: "VL1", -2: "VL2", -3: "VL3"}[a1 - b1]])
            a0 = a1
            color ^= 1
        else:
            w.put(_M["H"])
            base = a0 if a0 > 0 else 0
            _put_run(w, a1 - base, color)
            _put_run(w, a2 - a1, 1 - color)
            a0 = a2


def encode_ccitt(img: np.ndarray, compression: int,
                 t4_options: int = 0) -> bytes:
    """Encode a (h, w) 0/1 bit image as one CCITT chunk.
    compression 2 = MH RLE (byte-aligned lines), 3 = G3 (EOL before
    every line; 2-D with tag bits when t4_options bit 0; byte-aligned
    EOLs when bit 2), 4 = G4 MMR + EOFB."""
    h, _wd = img.shape
    w = _BitW()
    if compression == 2:
        for r in range(h):
            w.align()
            _put_1d_line(w, img[r])
    elif compression == 4:
        ref: list = []
        for r in range(h):
            _put_2d_line(w, img[r], ref)
            ref = _changes_of(img[r])
        w.put(_EOL)
        w.put(_EOL)                      # EOFB
    elif compression == 3:
        two_d = bool(t4_options & 1)
        aligned = bool(t4_options & 4)
        ref = []
        for r in range(h):
            if aligned:
                w.pad_for_eol(extra=1 if two_d else 0)
            w.put(_EOL)
            if two_d:
                # K-factor style: a 1-D anchor line every 4 rows
                use_1d = (r % 4 == 0)
                w.put("1" if use_1d else "0")
                if use_1d:
                    _put_1d_line(w, img[r])
                else:
                    _put_2d_line(w, img[r], ref)
            else:
                _put_1d_line(w, img[r])
            ref = _changes_of(img[r])
    else:
        raise ValueError(f"not a CCITT compression: {compression}")
    return w.tobytes()
