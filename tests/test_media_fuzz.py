"""Media-decoder robustness: at corpus scale a decoder that RAISES on
one malformed payload fails the whole mapInPandas task (and with it the
job); the contract is 'valid array or None, never an exception'.
Hypothesis-fuzz every decoder with random bytes, truncations and
single-byte corruptions of valid payloads — magic bytes preserved so
the fuzz actually reaches the parser, not the sniffer."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from fstd2pandas_spark.operators.llm.jpeg import decode_jpeg
from fstd2pandas_spark.operators.llm.multimodal import (
    decode_image, decode_wav, parse_avi)

from _gif_ref import encode_gif
from _jpeg_ref import encode_jpeg, encode_jpeg_progressive
from _png_ref import encode_png
from _tiff_ref import encode_tiff


def _img(seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=(16, 16, 3)).astype(np.uint8)


def _bmp24(img):
    import struct
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for y in range(h - 1, -1, -1))
    off = 54
    return (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(rows), 2835, 2835, 0, 0) + rows)


_VALID = {
    "ppm": (b"P6\n16 16\n255\n" + _img(8).tobytes()),
    "ppm_ascii": ("P3\n4 4\n255\n" + " ".join(
        str(v) for v in _img(9)[:4, :4].reshape(-1))).encode(),
    "bmp": _bmp24(_img(10)),
    "jpeg": encode_jpeg(_img(1)),
    "jpeg_prog": encode_jpeg_progressive(_img(4)),
    "png": encode_png(_img(2), ctype=2),
    "png_adam7": encode_png(_img(3), ctype=2, interlace=1),
    "gif": encode_gif(
        [np.random.RandomState(5).randint(0, 8, size=(16, 16))],
        np.random.RandomState(6).randint(0, 256, size=(8, 3))
        .astype(np.uint8)),
    "tiff": encode_tiff(_img(7), compression=5),
}


def _check_image_result(out):
    assert out is None or (
        isinstance(out, np.ndarray) and out.dtype == np.uint8
        and out.ndim == 3 and out.shape[2] == 3)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_image_never_raises_on_random_bytes(payload):
    _check_image_result(decode_image(payload))


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(sorted(_VALID)), st.data())
def test_decoders_survive_truncation(kind, data):
    payload = _VALID[kind]
    cut = data.draw(st.integers(min_value=0, max_value=len(payload)))
    _check_image_result(decode_image(payload[:cut]))


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(sorted(_VALID)), st.data())
def test_decoders_survive_corruption(kind, data):
    """Flip one byte anywhere past the magic: decode must still return
    None or a well-formed array (bit rot, truncation mid-transfer and
    adversarial inputs all look like this in a crawl)."""
    payload = bytearray(_VALID[kind])
    magic = {"png": 8, "gif": 6, "tiff": 4, "ppm": 2,
             "bmp": 2}.get(kind.split("_")[0], 3)
    pos = data.draw(st.integers(min_value=magic,
                                max_value=len(payload) - 1))
    val = data.draw(st.integers(min_value=0, max_value=255))
    payload[pos] = val
    _check_image_result(decode_image(bytes(payload)))


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_wav_and_avi_never_raise(payload):
    for prefix in (b"", b"RIFF"):
        p = prefix + payload
        wav = decode_wav(p)
        assert wav is None or (isinstance(wav[0], np.ndarray)
                               and wav[1] > 0)
        avi = parse_avi(p)
        assert avi is None or (avi[0] > 0 and len(avi[1]) > 0)


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_jpeg_corruption_direct(data):
    """decode_jpeg itself (not just via dispatch): corrupt marker
    lengths and entropy bytes."""
    payload = bytearray(_VALID["jpeg"])
    n_flips = data.draw(st.integers(min_value=1, max_value=4))
    for _ in range(n_flips):
        pos = data.draw(st.integers(min_value=2,
                                    max_value=len(payload) - 1))
        payload[pos] = data.draw(st.integers(min_value=0, max_value=255))
    out = decode_jpeg(bytes(payload))
    assert out is None or (out.dtype == np.uint8 and out.ndim == 3)


def test_png_forged_dims_rejected_without_allocation():
    """A forged IHDR declaring ~2.8e9 rows with a few IDAT bytes must
    return None fast instead of allocating (h, w, channels) — the
    hypothesis-found Adam7 DoS (2818572304 x 16 needed 126 GiB)."""
    import struct
    import zlib

    from fstd2pandas_spark.operators.llm.multimodal import decode_image

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    for interlace in (0, 1):
        ihdr = struct.pack(">IIBBBBB", 16, 2818572304, 8, 2, 0, 0,
                           interlace)
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
                   + chunk(b"IEND", b""))
        assert decode_image(payload) is None


def test_forged_dims_rejected_cheaply_all_decoders():
    """A tiny payload whose header claims a multi-GiB output must be
    rejected/truncated BEFORE allocation in every dimensioned decoder
    (GIF logical screen, JPEG SOF, TIFF IFD) — the shared
    MAX_DECODE_BYTES budget. None-over-OOM, the media-kernel contract."""
    import struct

    from fstd2pandas_spark.operators.llm.gif import decode_gif, parse_gif
    from fstd2pandas_spark.operators.llm.tiff import decode_tiff

    # GIF: 65535 x 65535 logical screen (~12.9 GiB canvas)
    gif = b"GIF89a" + struct.pack("<HH", 65535, 65535) + b"\x00\x00\x00"
    assert decode_gif(gif + b";") is None
    assert parse_gif(gif + b";") is None

    # JPEG: SOF0 claiming 65535 x 65535, 3 components
    jpg = (b"\xff\xd8\xff" + b"\xc0" + struct.pack(">H", 17) + b"\x08"
           + struct.pack(">HH", 65535, 65535) + b"\x03"
           + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
           + b"\xff\xd9")
    assert decode_image(jpg) is None

    # TIFF: II header, IFD claiming 1e6 x 1e6 RGB
    def entry(tag, typ, val):
        return struct.pack("<HHI", tag, typ, 1) + struct.pack("<I", val)
    ifd = b"".join([
        entry(256, 4, 1_000_000), entry(257, 4, 1_000_000),
        entry(259, 3, 1), entry(262, 3, 2), entry(277, 3, 3),
        entry(273, 4, 8), entry(279, 4, 4),
    ])
    tif = (b"II*\x00" + struct.pack("<I", 16) + b"\x00" * 8
           + struct.pack("<H", 7) + ifd + struct.pack("<I", 0))
    assert decode_tiff(tif) is None


def test_gif_animation_cumulative_frames_capped(monkeypatch):
    """A long animation of a large canvas truncates the frame list at
    the cumulative budget instead of materializing every frame."""
    import fstd2pandas_spark.operators.llm.gif as gifmod
    from fstd2pandas_spark.operators.llm.gif import parse_gif

    from _gif_ref import encode_gif

    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0],
                        [0, 0, 255]], dtype=np.uint8)
    frames = [np.full((8, 8), seed % 4, dtype=np.uint8)
              for seed in range(6)]
    payload = encode_gif(frames, palette)
    full = parse_gif(payload)
    assert full is not None and len(full[1]) == 6
    # budget that only fits two 8x8 frames (192 bytes each)
    monkeypatch.setattr(gifmod, "MAX_DECODE_BYTES", 2 * 8 * 8 * 3)
    capped = parse_gif(payload)
    assert capped is not None and len(capped[1]) == 2
    np.testing.assert_array_equal(capped[1][0], full[1][0])


def test_tiff_forged_tag_count_rejected_before_format_string():
    """A 34-byte TIFF claiming a 100M-value tag must be rejected before
    struct builds the multi-GiB format string (uncatchable MemoryError
    at 0xFFFFFFFF)."""
    import struct
    import time

    from fstd2pandas_spark.operators.llm.tiff import decode_tiff

    def entry(tag, typ, count, val):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", val)

    for count in (100_000_000, 0xFFFFFFFF):
        tif = (b"II*\x00" + struct.pack("<I", 8)
               + struct.pack("<H", 1) + entry(256, 4, count, 8)
               + struct.pack("<I", 0))
        t0 = time.perf_counter()
        assert decode_tiff(tif) is None
        assert time.perf_counter() - t0 < 0.5


def test_gif_forged_frame_dims_rejected_before_lzw():
    """A GIF whose logical screen passes the canvas cap but whose frame
    descriptor claims 65535x65535 must reject BEFORE the LZW decode
    materializes toward 4.3e9 pixels."""
    import struct
    import time

    from fstd2pandas_spark.operators.llm.gif import decode_gif

    hdr = (b"GIF89a" + struct.pack("<HH", 4, 4) + b"\xf0\x00\x00"
           + b"\x00\x00\x00" + b"\xff\xff\xff")          # 2-color GCT
    desc = (b"\x2c" + struct.pack("<HHHH", 0, 0, 65535, 65535) + b"\x00")
    lzw = b"\x02" + b"\xfe" + b"\x00" * 254 + b"\x00" + b";"
    t0 = time.perf_counter()
    assert decode_gif(hdr + desc + lzw) is None
    assert time.perf_counter() - t0 < 0.5


def test_parse_avi_deep_list_nesting_no_recursion_error():
    """Thousands of nested LIST chunks (60 KB) must not RecursionError
    out of the never-raise contract — the walk is an explicit stack."""
    import struct

    from fstd2pandas_spark.operators.llm.multimodal import parse_avi

    depth = 5000
    inner = b"00dc" + struct.pack("<I", 2) + b"hi"
    body = inner
    for _ in range(depth):
        body = b"LIST" + struct.pack("<I", len(body) + 4) + b"movi" + body
    payload = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    out = parse_avi(payload)
    assert out is not None and out[1] == [b"hi"]


def test_ppm_bmp_forged_headers_return_none():
    """The review-found crash class, pinned deterministically: PPM/BMP
    headers claiming more pixels than the payload ships escaped as
    numpy frombuffer/reshape ValueErrors (killing the mapInPandas
    task); non-numeric PPM tokens raised from int(); a zero dimension
    produced an empty image that crashed dhash downstream; and
    maxval > 255 (2-byte samples per the spec, unimplemented here)
    silently mis-decoded as 1-byte instead of falling back."""
    from fstd2pandas_spark.operators.llm.multimodal import (
        decode_image, dhash_bits)

    bad = [
        b"P6\n1000000 1000000 255\n" + b"\x00" * 32,   # forged dims
        b"P6\nab cd 255\n" + b"\x00" * 16,             # non-numeric
        b"P6\n0 0 255\n",                              # zero dims
        b"P6\n2 2 65535\n" + b"\x00" * 24,             # 16-bit maxval
        b"P3\n4 4 255\n1 2 3",                         # short tokens
        b"P3\n2 2 255\n" + b"1 " * 11 + b"xyz",        # bad P3 token
        b"BM" + b"\x00" * 20 + b"\xff\xff\xff\x7f"     # forged BMP h
        + b"\x00" * 40,
    ]
    for p in bad:
        assert decode_image(p) is None, p[:24]

    # a legitimate tiny PPM still decodes and dhashes
    ok = b"P6\n2 2\n255\n" + bytes(range(12))
    img = decode_image(ok)
    assert img is not None and img.shape == (2, 2, 3)
    assert isinstance(dhash_bits(img, 4), int)
    # and sub-255 maxval still rescales (1-byte samples)
    ok2 = decode_image(b"P6\n1 1\n3\n\x03\x00\x01")
    assert ok2 is not None and list(ok2.reshape(-1)) == [255, 0, 85]
