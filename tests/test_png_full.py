"""PNG decoder coverage beyond the 8-bit non-interlaced core: palette
(PLTE, 8-bit and sub-byte indices), greyscale at depths 1/2/4, 16-bit
samples (high byte), and Adam7 interlacing — against the fuller test
encoder in tests/_png_ref.py. Pure numpy, no Spark session needed."""

from __future__ import annotations

import numpy as np

from fstd2pandas_spark.operators.llm.multimodal import decode_image

from _png_ref import encode_png


def _rng(seed=5):
    return np.random.RandomState(seed)


def test_palette_8bit():
    pal = _rng(1).randint(0, 256, size=(17, 3)).astype(np.uint8)
    idx = _rng(2).randint(0, 17, size=(9, 7)).astype(np.uint8)
    got = decode_image(encode_png(idx, ctype=3, palette=pal,
                                  filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, pal[idx])


def test_palette_4bit_subbyte():
    pal = _rng(3).randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = _rng(4).randint(0, 16, size=(6, 11)).astype(np.uint8)
    got = decode_image(encode_png(idx, ctype=3, depth=4, palette=pal))
    assert np.array_equal(got, pal[idx])


def test_palette_index_out_of_range_is_none():
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.full((3, 3), 9, dtype=np.uint8)  # index past the palette
    assert decode_image(encode_png(idx, ctype=3, palette=pal)) is None


def test_grey_1bit():
    bw = _rng(5).randint(0, 2, size=(10, 13)).astype(np.uint8)
    got = decode_image(encode_png(bw, ctype=0, depth=1))
    assert np.array_equal(got, np.repeat((bw * 255)[..., None], 3, axis=2))


def test_grey_2bit_and_4bit_rescale():
    for depth in (2, 4):
        mx = (1 << depth) - 1
        g = _rng(depth).randint(0, mx + 1, size=(7, 9)).astype(np.uint8)
        got = decode_image(encode_png(g, ctype=0, depth=depth))
        want = (g.astype(np.uint16) * 255 // mx).astype(np.uint8)
        assert np.array_equal(got, np.repeat(want[..., None], 3, axis=2))


def test_rgb_16bit_high_byte():
    px16 = _rng(7).randint(0, 65536, size=(5, 6, 3)).astype(np.uint16)
    got = decode_image(encode_png(px16, ctype=2, depth=16,
                                  filters=[0, 2, 1, 4, 3]))
    assert np.array_equal(got, (px16 >> 8).astype(np.uint8))


def test_grey_alpha_16bit():
    ga = _rng(8).randint(0, 65536, size=(4, 5, 2)).astype(np.uint16)
    got = decode_image(encode_png(ga, ctype=4, depth=16))
    grey = (ga[..., 0] >> 8).astype(np.uint8)
    assert np.array_equal(got, np.repeat(grey[..., None], 3, axis=2))


def test_adam7_rgb():
    img = _rng(9).randint(0, 256, size=(13, 11, 3)).astype(np.uint8)
    got = decode_image(encode_png(img, ctype=2, interlace=1,
                                  filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, img)


def test_adam7_empty_passes():
    # 3x2: several Adam7 passes are empty (pw or ph == 0)
    img = _rng(10).randint(0, 256, size=(3, 2, 3)).astype(np.uint8)
    got = decode_image(encode_png(img, ctype=2, interlace=1))
    assert np.array_equal(got, img)
    # 1x1: only pass 1 has pixels
    one = np.array([[[7, 77, 177]]], dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(one, ctype=2,
                                                  interlace=1)), one)


def test_adam7_palette_subbyte():
    pal = _rng(11).randint(0, 256, size=(4, 3)).astype(np.uint8)
    idx = _rng(12).randint(0, 4, size=(9, 10)).astype(np.uint8)
    got = decode_image(encode_png(idx, ctype=3, depth=2, interlace=1,
                                  palette=pal))
    assert np.array_equal(got, pal[idx])


def test_adam7_rgba_16bit():
    px = _rng(13).randint(0, 65536, size=(10, 9, 4)).astype(np.uint16)
    got = decode_image(encode_png(px, ctype=6, depth=16, interlace=1,
                                  filters=[4]))
    assert np.array_equal(got, (px[..., :3] >> 8).astype(np.uint8))


def test_truncated_and_malformed_still_none():
    img = _rng(14).randint(0, 256, size=(6, 6, 3)).astype(np.uint8)
    png = encode_png(img, ctype=2)
    assert decode_image(png[:30]) is None
    # depth/ctype combination the spec forbids (palette at depth 16)
    bad = bytearray(png)
    # IHDR depth byte lives at offset 8(sig)+8(len+cid)+8(w+h)
    bad[24] = 16
    bad[25] = 3
    assert decode_image(bytes(bad)) is None
