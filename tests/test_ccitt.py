"""CCITT T.4/T.6 fax decode (tiff.py compressions 2/3/4 via ccitt.py)
against the independent-mode-selection test encoder (_ccitt_ref.py).

The encoder shares the literal published T.4 tables with the decoder
(mirrored-constant caveat), so beyond round-trips these tests also pin
spot codewords against the ITU-T T.4 standard's well-known values and
assert the structural prefix-free property of the whole table."""

import numpy as np
import pytest

from fstd2pandas_spark.operators.llm.tiff import decode_tiff
from _tiff_ref import encode_tiff


def _rt(img, **kw):
    got = decode_tiff(encode_tiff(img, bit_depth=1, **kw))
    photo = kw.get("photometric", 0)
    g = (255 * (1 - img)) if photo == 0 else (255 * img)
    want = np.repeat(g.astype(np.uint8)[..., None], 3, axis=2)
    assert got is not None, kw
    np.testing.assert_array_equal(got, want)


def _fax_like(seed=5, h=23, w=37):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), dtype=np.uint8)
    for _ in range(12):
        y, x = rng.integers(0, h - 3), rng.integers(0, w - 3)
        img[y:y + rng.integers(1, 8), x:x + rng.integers(1, 10)] = 1
    return img


@pytest.mark.parametrize("comp,opts", [
    (2, 0),        # Modified Huffman RLE (byte-aligned lines)
    (3, 0),        # G3 1-D with EOLs
    (3, 1),        # G3 2-D (tag bits, K-factor mix of 1-D/2-D lines)
    (3, 4),        # G3 1-D, byte-aligned EOLs
    (3, 5),        # G3 2-D, byte-aligned EOLs
    (4, 0),        # G4 MMR + EOFB
])
def test_ccitt_roundtrip_all_codings(comp, opts):
    img = _fax_like()
    _rt(img, photometric=0, compression=comp, t4_options=opts)


@pytest.mark.parametrize("comp,opts", [(2, 0), (3, 0), (3, 1), (4, 0)])
def test_ccitt_edge_images(comp, opts):
    """Dense noise (worst case for 2-D modes: mostly horizontal
    codes), all-black, all-white, 1-px-wide, and runs past the 2560
    extended-makeup ceiling (chained max makeups)."""
    rng = np.random.default_rng(11)
    wide = np.zeros((3, 3000), np.uint8)
    wide[1, 2900:] = 1
    for img in ((rng.random((17, 29)) < 0.5).astype(np.uint8),
                np.ones((5, 9), np.uint8),
                np.zeros((5, 9), np.uint8),
                wide,
                (rng.random((40, 1)) < 0.5).astype(np.uint8)):
        _rt(img, photometric=0, compression=comp, t4_options=opts)


def test_ccitt_layouts_fillorder_photometric():
    """Multi-strip (independent per-strip coding, reference line
    resets), tiled layout, FillOrder 2 (LSB-first bit order), and
    BlackIsZero photometric."""
    img = _fax_like(seed=7)
    _rt(img, photometric=0, compression=4, rows_per_strip=7)
    _rt(img, photometric=0, compression=2, rows_per_strip=5)
    _rt(img, photometric=0, compression=3, rows_per_strip=6,
        t4_options=1)
    _rt(img, photometric=0, compression=4, tile=(16, 8))
    _rt(img, photometric=0, compression=2, tile=(8, 8))
    _rt(img, photometric=0, compression=4, fill_order=2)
    _rt(img, photometric=0, compression=3, t4_options=1, fill_order=2)
    _rt(img, photometric=1, compression=4)


def test_ccitt_randomized_property_sweep():
    """64 random images across densities, sizes, codings and layouts —
    every one must round-trip exactly."""
    rng = np.random.default_rng(99)
    combos = [(2, 0, None), (3, 0, None), (3, 1, None), (3, 5, None),
              (4, 0, None), (4, 0, (8, 8)), (2, 0, (16, 4)),
              (3, 1, (8, 16))]
    for i in range(64):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 70))
        dens = float(rng.random())
        img = (rng.random((h, w)) < dens).astype(np.uint8)
        comp, opts, tile = combos[i % len(combos)]
        kw = {"photometric": 0, "compression": comp, "t4_options": opts}
        if tile:
            kw["tile"] = tile
        _rt(img, **kw)


def test_ccitt_hostile_inputs_return_none():
    """Truncated streams, runs past the line end, bad FillOrder and
    non-bilevel headers must all hit the honest None fallback, never
    garbage or a crash."""
    import struct

    img = _fax_like(seed=3)
    p = encode_tiff(img, photometric=0, compression=4, bit_depth=1)
    assert decode_tiff(p[:len(p) - 6]) is None          # truncated G4
    p2 = encode_tiff(img, photometric=0, compression=2, bit_depth=1)
    assert decode_tiff(p2[:len(p2) - 4]) is None        # truncated MH
    # forge width up: every decoded line now under-fills -> bad code /
    # overrun, never a fabricated image
    buf = bytearray(p2)
    ifd = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd:ifd + 2])[0]
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", buf[e:e + 2])[0] == 256:
            buf[e + 8:e + 12] = struct.pack("<I", 500)
    assert decode_tiff(bytes(buf)) is None
    # bits-per-sample 8 with a CCITT compression is contradictory
    buf = bytearray(p)
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", buf[e:e + 2])[0] == 258:
            buf[e + 8:e + 12] = struct.pack("<I", 8)
    assert decode_tiff(bytes(buf)) is None


def test_ccitt_tiled_forged_tile_dims_rejected():
    """A forged TileLength dwarfing the (budget-checked) image area
    must hit the per-tile decode budget, not start materializing a
    2**30-row tile — the same forged-dims class every other tiled
    layout guards against."""
    import struct

    img = _fax_like(seed=11, h=16, w=16)
    p = encode_tiff(img, photometric=0, compression=4, bit_depth=1,
                    tile=(16, 16))
    buf = bytearray(p)
    ifd = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd:ifd + 2])[0]
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", buf[e:e + 2])[0] == 323:  # TileLength
            buf[e + 8:e + 12] = struct.pack("<I", 1 << 30)
    assert decode_tiff(bytes(buf)) is None


def test_t4_table_spot_codewords_and_prefix_property():
    """Pin famous T.4 codewords straight from the published tables
    (white 0 = 00110101, white 1 = 000111, white 64 = 11011, white
    1664 = 011000, black 0 = 0000110111, black 1 = 010, black 2 = 11,
    black 64 = 0000001111, EOL = 000000000001, V0 = 1, pass = 0001,
    horizontal = 001) and assert the full code set is prefix-free —
    the structural property a transcription slip breaks immediately."""
    from fstd2pandas_spark.operators.llm import ccitt as C

    white = dict(C._WHITE_CODES)
    black = dict(C._BLACK_CODES)
    assert white[0] == "00110101" and white[1] == "000111"
    assert white[64] == "11011" and white[1664] == "011000"
    assert black[0] == "0000110111" and black[1] == "010"
    assert black[2] == "11" and black[64] == "0000001111"
    assert C._EOL == "000000000001"
    modes = dict(C._MODE_CODES)
    assert modes["V0"] == "1" and modes["P"] == "0001" \
        and modes["H"] == "001"
    # counts: 64 terminating + 27 makeups per colour, 13 extended
    assert len(C._WHITE_CODES) == 91 and len(C._BLACK_CODES) == 91
    assert len(C._EXT_CODES) == 13
    # _prefix_map raises on duplicates/prefix collisions at import
    # time; re-run it explicitly so the property is asserted HERE too
    C._prefix_map(C._WHITE_CODES + C._EXT_CODES)
    C._prefix_map(C._BLACK_CODES + C._EXT_CODES)
    # every run 0..63 terminating and every multiple of 64 to 2560
    # has exactly one code per colour
    for t in (C._WHITE_CODES, C._BLACK_CODES):
        runs = [r for r, _ in t]
        assert sorted(runs) == list(range(64)) + [64 * k
                                                  for k in range(1, 28)]
    assert [r for r, _ in C._EXT_CODES] == [1792 + 64 * k
                                            for k in range(13)]


def test_fax_gate_construction_matches_production_decode():
    """Pins the mm_features kind='fax' gate end-to-end in pytest: the
    md5-derived run construction, the test-encoder payload, the
    production decode, and the oracle's arithmetic predictions
    (n_black, 16-bit dHash, total TIFF byte length via the T.4
    code-length tables) must all agree — the same contract the
    driver gate checks, pinned here so a table or encoder drift
    fails fast without a full oracle run."""
    import hashlib

    import numpy as np

    from fstd2pandas_spark.operators.llm.ccitt import (
        _BLACK_CODES, _EXT_CODES, _WHITE_CODES)
    from fstd2pandas_spark.operators.llm.multimodal import (
        decode_image, dhash_bits)
    from _tiff_ref import encode_tiff

    WL = {r: len(b) for r, b in _WHITE_CODES + _EXT_CODES}
    BL = {r: len(b) for r, b in _BLACK_CODES + _EXT_CODES}
    VL = {0: 1, 1: 3, 2: 6}
    for did in range(8):
        hb = hashlib.md5(f"fax{did}".encode()).digest()
        if did % 2 == 0:
            comp = 2
            runs = [(1 + hb[2 * r] % 20, 1 + hb[2 * r + 1] % 30)
                    for r in range(8)]
        else:
            comp = 4
            w10, bk = 2 + hb[0] % 19, 3 + hb[1] % 27
            runs = [(w10 + ((hb[7 + r] % 3) - 1 if r else 0), bk)
                    for r in range(8)]
        img = np.zeros((8, 64), dtype=np.uint8)
        for r, (w1, bb) in enumerate(runs):
            img[r, w1:w1 + bb] = 1
        tiff = encode_tiff(img, photometric=0, compression=comp,
                           bit_depth=1)
        dec = decode_image(tiff)
        assert dec is not None and dec.shape == (8, 64, 3)
        assert int((dec[..., 0] == 0).sum()) == sum(b for _w, b in runs)
        yi = [(r * 8) // 4 for r in range(4)]
        xi = [(c * 64) // 5 for c in range(5)]
        v = 0
        for r in range(4):
            w1, bb = runs[yi[r]]
            for c in range(4):
                if not (w1 <= xi[c] < w1 + bb) \
                        and w1 <= xi[c + 1] < w1 + bb:
                    v |= 1 << (r * 4 + c)
        assert dhash_bits(dec, size=4) == v
        if comp == 2:
            chunk = sum((WL[w1] + BL[b] + WL[64 - w1 - b] + 7) // 8
                        for w1, b in runs)
        else:
            bits = 3 + WL[runs[0][0]] + BL[runs[0][1]] + 1 + 24
            bits += sum(2 * VL[abs(runs[r][0] - runs[r - 1][0])] + 1
                        for r in range(1, 8))
            chunk = (bits + 7) // 8
        assert len(tiff) == 134 + chunk
