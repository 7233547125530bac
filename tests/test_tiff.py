"""TIFF decoder tests against the in-repo encoder: byte orders, all
three codec-free compressions (incl. TIFF-LZW's early-change width
rule on noisy data), horizontal predictor, multi-strip layout, the
four photometrics, and honest fallbacks."""

from __future__ import annotations

import numpy as np

from fstd2pandas_spark.operators.llm.tiff import decode_tiff

from _tiff_ref import encode_tiff


def _img(seed, h=20, w=27, ch=3):
    shape = (h, w, ch) if ch else (h, w)
    return np.random.RandomState(seed).randint(0, 256, size=shape) \
        .astype(np.uint8)


def test_uncompressed_rgb():
    img = _img(1)
    got = decode_tiff(encode_tiff(img))
    assert np.array_equal(got, img)


def test_lzw_noisy_width_growth():
    img = _img(2, h=90, w=97)
    got = decode_tiff(encode_tiff(img, compression=5))
    assert np.array_equal(got, img)


def test_lzw_with_horizontal_predictor():
    # smooth gradient: the predictor's natural prey
    yy, xx = np.mgrid[0:40, 0:50]
    img = np.dstack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) * 2) % 256]).astype(np.uint8)
    got = decode_tiff(encode_tiff(img, compression=5, predictor=2))
    assert np.array_equal(got, img)


def test_packbits_with_runs():
    img = _img(3)
    img[:, 5:15] = 77  # long runs for packbits
    got = decode_tiff(encode_tiff(img, compression=32773))
    assert np.array_equal(got, img)


def test_multi_strip():
    img = _img(4, h=33)
    got = decode_tiff(encode_tiff(img, compression=5, rows_per_strip=7))
    assert np.array_equal(got, img)


def test_greyscale_both_polarities():
    g = _img(5, ch=0)
    got = decode_tiff(encode_tiff(g, photometric=1))
    assert np.array_equal(got, np.repeat(g[..., None], 3, axis=2))
    inv = decode_tiff(encode_tiff(g, photometric=0))
    assert np.array_equal(inv, np.repeat((255 - g)[..., None], 3, axis=2))


def test_rgba_drops_alpha():
    img = _img(6, ch=4)
    got = decode_tiff(encode_tiff(img))
    assert np.array_equal(got, img[..., :3])


def test_palette():
    pal = _img(7, h=16, w=3, ch=0).reshape(16, 3)
    idx = np.random.RandomState(8).randint(0, 16, size=(12, 14)) \
        .astype(np.uint8)
    got = decode_tiff(encode_tiff(idx, photometric=3, palette=pal))
    assert np.array_equal(got, pal[idx])


def test_malformed_returns_none():
    img = _img(9)
    t = encode_tiff(img, compression=5)
    assert decode_tiff(t[:30]) is None
    assert decode_tiff(b"II*\x00garbage") is None
    assert decode_tiff(b"nope") is None
    assert decode_tiff(None) is None
    bad = bytearray(t)
    for i in range(120, min(len(bad), 160)):
        bad[i] ^= 0xAA
    out = decode_tiff(bytes(bad))
    assert out is None or (out.dtype == np.uint8 and out.ndim == 3)


def test_decode_image_dispatches_tiff():
    from fstd2pandas_spark.operators.llm.multimodal import decode_image

    img = _img(10)
    got = decode_image(encode_tiff(img, compression=32773))
    assert np.array_equal(got, img)


def test_tiled_tiff_roundtrip_all_codecs():
    """Tiled layout (the GeoTIFF norm): none/LZW/PackBits tiles, with
    and without the horizontal predictor, including edge tiles clipped
    from zero-padded full tiles on non-multiple dimensions."""
    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 11, 3), dtype=np.uint8)  # 13x11: edges
    for comp in (1, 5, 32773):
        for pred in (1, 2):
            payload = encode_tiff(img, compression=comp, predictor=pred,
                                  tile=(8, 8))
            out = decode_tiff(payload)
            assert out is not None, (comp, pred)
            np.testing.assert_array_equal(out, img)
    # tile exactly divides: 16x8 tiles over 16x16
    img2 = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(img2, compression=5, tile=(16, 8))), img2)
    # grey tiled
    g = rng.integers(0, 256, (10, 10), dtype=np.uint8)
    exp = np.repeat(g[..., None], 3, axis=2)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(g, photometric=1, tile=(4, 4))), exp)


def test_tiled_tiff_guards():
    """Forged tile dims and short tile tables reject cleanly."""
    import struct

    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(img, tile=(4, 4)))
    # find the TileWidth (322) entry and forge a huge tile
    n = struct.unpack("<H", payload[8:10])[0]
    for i in range(n):
        e = 10 + 12 * i
        tag = struct.unpack("<H", payload[e:e + 2])[0]
        if tag == 322:
            payload[e + 8:e + 12] = struct.pack("<I", 2_000_000_000)
    assert decode_tiff(bytes(payload)) is None


def test_16bit_tiff_strip_and_tiled():
    """16-bit samples decode via the high byte (the PNG depth-16
    policy), with the predictor applied at sample width, in both strip
    and tiled layouts and all three codecs."""
    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    rng = np.random.default_rng(11)
    img16 = rng.integers(0, 65536, (9, 7, 3), dtype=np.uint16)
    exp = (img16 >> 8).astype(np.uint8)
    for comp in (1, 5, 32773):
        for pred in (1, 2):
            got = decode_tiff(encode_tiff(img16, compression=comp,
                                          predictor=pred, bit_depth=16))
            assert got is not None, (comp, pred)
            np.testing.assert_array_equal(got, exp)
    got_t = decode_tiff(encode_tiff(img16, compression=5, predictor=2,
                                    tile=(4, 4), bit_depth=16))
    np.testing.assert_array_equal(got_t, exp)
    # 16-bit grey
    g16 = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    expg = np.repeat((g16 >> 8).astype(np.uint8)[..., None], 3, axis=2)
    np.testing.assert_array_equal(
        decode_tiff(encode_tiff(g16, photometric=1, bit_depth=16)), expg)


def test_jpeg_in_tiff_strip_tiled_and_tables():
    """Compression 7 (new-style JPEG-in-TIFF, TTN2): per-strip and
    per-tile JPEG streams decode through the real JPEG decoder (lossy
    — tolerance gate), and the JPEGTables (347) abbreviated-stream
    splice path reconstructs the same pixels as the full streams."""
    import struct

    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    # smooth gradient: JPEG-friendly content keeps the loss small
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([(y * 8 + 32), (x * 8 + 16),
                    ((x + y) * 4 + 64)], axis=-1).astype(np.uint8)

    full_strip = decode_tiff(encode_tiff(img, compression=7,
                                         rows_per_strip=8))
    assert full_strip is not None
    assert np.abs(full_strip.astype(int) - img.astype(int)).max() <= 16

    tiled = decode_tiff(encode_tiff(img, compression=7, tile=(8, 8)))
    assert tiled is not None
    assert np.abs(tiled.astype(int) - img.astype(int)).max() <= 16

    # JPEGTables variant by segment surgery: pull DQT/DHT out of each
    # strip stream into an abbreviated tables stream (SOI+segs+EOI)
    payload = bytearray(encode_tiff(img, compression=7,
                                    rows_per_strip=16))

    def segments(stream):
        segs, i = [], 2
        while i + 4 <= len(stream):
            marker = stream[i:i + 2]
            if marker == b"\xff\xda":   # SOS: rest is entropy data
                segs.append((marker, stream[i:]))
                break
            ln = struct.unpack(">H", stream[i + 2:i + 4])[0]
            segs.append((marker, stream[i:i + 2 + ln]))
            i += 2 + ln
        return segs

    # locate the single strip's stream inside the file
    soi = bytes(payload).index(b"\xff\xd8\xff")
    stream = bytes(payload[soi:])
    segs = segments(stream)
    tables = b"".join(s for m, s in segs if m in (b"\xff\xdb", b"\xff\xc4"))
    rest = b"".join(s for m, s in segs if m not in (b"\xff\xdb", b"\xff\xc4"))
    abbrev_strip = b"\xff\xd8" + rest
    jpegtables = b"\xff\xd8" + tables + b"\xff\xd9"
    from _tiff_ref import encode_tiff as _et  # rebuild with the pieces

    # hand-assemble: easiest is re-encoding via the library under test
    # is not possible, so append the tables tag by rewriting the file:
    # encode a fresh TIFF whose strip is the abbreviated stream and
    # whose IFD carries tag 347. Reuse encode_tiff's layout by patching
    # the single strip bytes is brittle; instead decode the merged
    # stream directly to pin the splice semantics the decoder uses.
    from fstd2pandas_spark.operators.llm.jpeg import decode_jpeg

    merged = jpegtables[:-2] + abbrev_strip[2:]
    direct = decode_jpeg(stream)
    via_tables = decode_jpeg(merged)
    assert via_tables is not None
    np.testing.assert_array_equal(via_tables, direct)


def test_jpeg_in_tiff_jpegtables_tag():
    """The tag-347 splice path end-to-end: abbreviated per-strip
    streams (DQT/DHT moved to JPEGTables) decode identically to the
    full-stream variant through decode_tiff itself."""
    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    # all four tiles identical content: TTN2's JPEGTables contract is
    # that every strip/tile shares ONE table set, and the reference
    # encoder's Huffman tables are content-adaptive
    y, x = np.mgrid[0:8, 0:8]
    block = np.stack([(y * 8 + 32), (x * 8 + 16),
                      ((x + y) * 4 + 64)], axis=-1).astype(np.uint8)
    img = np.tile(block, (2, 2, 1))
    full = decode_tiff(encode_tiff(img, compression=7, tile=(8, 8)))
    split = decode_tiff(encode_tiff(img, compression=7, tile=(8, 8),
                                    jpeg_split_tables=True))
    assert split is not None
    np.testing.assert_array_equal(split, full)


def test_planar_configuration_2_strips():
    """Planar config 2: per-component strip planes (all of channel 0,
    then 1, ...) reassemble exactly, across codecs, predictor, 16-bit,
    and multi-strip splits."""
    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    for comp in (1, 5, 32773):
        for pred in (1, 2):
            got = decode_tiff(encode_tiff(img, compression=comp,
                                          predictor=pred, planar=2,
                                          rows_per_strip=4))
            assert got is not None, (comp, pred)
            np.testing.assert_array_equal(got, img)
    img16 = rng.integers(0, 65536, (6, 5, 3), dtype=np.uint16)
    got16 = decode_tiff(encode_tiff(img16, compression=5, planar=2,
                                    bit_depth=16, rows_per_strip=2))
    np.testing.assert_array_equal(got16, (img16 >> 8).astype(np.uint8))


def test_forged_rows_per_strip_zero_returns_none():
    """rows_per_strip=0 (forged) must reject cleanly — the planar
    strip-count ceil division would otherwise ZeroDivisionError out of
    the never-raise contract."""
    import struct

    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    payload = bytearray(encode_tiff(np.zeros((8, 8, 3), dtype=np.uint8),
                                    rows_per_strip=4))
    n = struct.unpack("<H", payload[8:10])[0]
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack("<H", payload[e:e + 2])[0] == 278:
            payload[e + 8:e + 12] = struct.pack("<I", 0)
    assert decode_tiff(bytes(payload)) is None

def _forge_tag(payload: bytes, tag: int, value: int) -> bytes:
    """Overwrite an inline IFD tag value in a little-endian one-IFD
    TIFF (test fixture surgery for hostile-header regression tests)."""
    import struct

    buf = bytearray(payload)
    ifd = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd:ifd + 2])[0]
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", buf[e:e + 2])[0] == tag:
            buf[e + 8:e + 12] = struct.pack("<I", value)
    return bytes(buf)


def test_jpeg_in_tiff_forged_strip_headers_return_none():
    """Compression-7 strip path mirrors the baseline strip guards:
    rows_per_strip=0 must reject (not fabricate an all-zero image),
    and a strip table too short to cover h rows must reject (not leave
    trailing rows silently zero)."""
    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    rng = np.random.default_rng(31)
    img = np.tile(rng.integers(0, 256, (1, 1, 3), dtype=np.uint8),
                  (8, 8, 1))
    payload = encode_tiff(img, compression=7, rows_per_strip=4)
    assert decode_tiff(payload) is not None          # fixture sane
    assert decode_tiff(_forge_tag(payload, 278, 0)) is None
    # 1-strip encode forged to claim 2-row strips -> table covers only
    # 4 of 8 rows
    one_strip = encode_tiff(img, compression=7)
    assert decode_tiff(_forge_tag(one_strip, 278, 2)) is None


def test_jpeg_in_tiff_undersized_chunk_rejected():
    """A JPEG chunk smaller than its strip must fail the coverage
    check (4-row JPEGs forged to claim 8-row strips)."""
    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    img = np.tile(np.array([[[10, 200, 30]]], dtype=np.uint8), (8, 8, 1))
    payload = encode_tiff(img, compression=7, rows_per_strip=4)
    assert decode_tiff(_forge_tag(payload, 278, 8)) is None


def test_jpeg_in_tiff_budget_uses_materialized_rgb(monkeypatch):
    """The comp-7 decode budget must weigh the h*w*3 uint8 the JPEG
    path actually materializes, not the header's declared spp*bps — a
    forged spp=1 header must not pass at 1/3 weight."""
    import numpy as np

    import fstd2pandas_spark.operators.llm.tiff as tiffmod
    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    img = np.tile(np.array([[[10, 200, 30]]], dtype=np.uint8), (8, 8, 1))
    payload = _forge_tag(encode_tiff(img, compression=7), 277, 1)
    # 8*8*1 = 64 passes the general spp*bps check; 8*8*3 = 192 must trip
    monkeypatch.setattr(tiffmod, "MAX_DECODE_BYTES", 128)
    assert decode_tiff(payload) is None

def test_old_style_jpeg_interchange_stream():
    """Compression 6 (old-style JPEG): the common real-world shape —
    one complete interchange JPEG at tags 513/514 — decodes through
    the real JPEG decoder; a comp-6 file WITHOUT the interchange tags
    (the tag-soup variant) stays the honest None fallback, as does a
    stream whose image underfills the declared dims."""
    import numpy as np

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff
    from _tiff_ref import encode_tiff

    block = np.zeros((8, 8, 3), dtype=np.uint8)
    block[:, :, 0] = 200
    block[:4, :, 2] = 90
    img = np.tile(block, (2, 2, 1))
    got = decode_tiff(encode_tiff(img, compression=6))
    assert got is not None and got.shape == (16, 16, 3)
    assert abs(int(got[0, 0, 0]) - 200) <= 12   # lossy tolerance
    # strip the interchange tags -> honest fallback
    import struct

    payload = bytearray(encode_tiff(img, compression=6))
    ifd = struct.unpack("<I", payload[4:8])[0]
    n = struct.unpack("<H", payload[ifd:ifd + 2])[0]
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", payload[e:e + 2])[0] in (513, 514):
            payload[e:e + 2] = struct.pack("<H", 60000)  # unknown tag
    assert decode_tiff(bytes(payload)) is None
    # forged dims larger than the stream -> coverage check fails
    payload = bytearray(encode_tiff(img, compression=6))
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", payload[e:e + 2])[0] == 257:
            payload[e + 8:e + 12] = struct.pack("<I", 64)
    assert decode_tiff(bytes(payload)) is None
