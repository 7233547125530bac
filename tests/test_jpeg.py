"""Baseline JPEG decoder tests: the library decoder against a minimal
spec-conformant encoder (tests/_jpeg_ref.py) that builds its own
canonical Huffman tables — so DHT parsing is exercised on fresh tables,
not just known constants. No Spark needed: the decoder is the numpy
kernel that mapInPandas batches over."""

from __future__ import annotations

import numpy as np
import pytest

from fstd2pandas_spark.operators.llm.jpeg import decode_jpeg
from fstd2pandas_spark.operators.llm.multimodal import decode_image

from _jpeg_ref import encode_jpeg


def _smooth(h, w, seed=7):
    """Low-frequency test image: JPEG with all-ones quant tables
    reconstructs it to within DCT rounding."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 96 + 64 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    g = 128 + 32 * np.cos((xx + yy) / 29.0)
    b = 64 + 48 * np.sin(yy / 13.0)
    rng = np.random.default_rng(seed)
    base = np.dstack([r, g, b]) + rng.normal(0, 2.0, (h, w, 3))
    return np.clip(base, 0, 255).astype(np.uint8)


def test_444_near_lossless_roundtrip():
    img = _smooth(40, 56)
    out = decode_jpeg(encode_jpeg(img))
    assert out is not None and out.shape == img.shape
    # all-ones quant: error budget is DCT+colour-transform rounding only
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 3
    assert err.mean() < 1.0


def test_nonmultiple_of_8_dims():
    img = _smooth(29, 35)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (29, 35, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_420_subsampled_grey_content_exact_chroma():
    """Greyscale content in a 4:2:0 colour JPEG: constant chroma makes
    the 2x2 box subsampling lossless, isolating the decoder's MCU walk
    and upsampling from subsampling loss."""
    g = _smooth(48, 64)[:, :, 0]
    img = np.dstack([g, g, g])
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 3
    # channels must stay (near-)equal: chroma planes were constant 128
    assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() <= 2
    assert np.abs(out[..., 1].astype(int) - out[..., 2].astype(int)).max() <= 2


def test_420_odd_dims():
    g = _smooth(37, 43)[:, :, 1]
    img = np.dstack([g, g, g])
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out.shape == (37, 43, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_restart_markers_match_unrestarted():
    img = _smooth(32, 48, seed=11)
    plain = decode_jpeg(encode_jpeg(img))
    restarted = decode_jpeg(encode_jpeg(img, restart_interval=3))
    np.testing.assert_array_equal(plain, restarted)


def test_quantized_lossy_and_16bit_dqt():
    """Real quantization (including a >255 value forcing 16-bit DQT
    precision): reconstruction is lossy but structurally faithful."""
    img = _smooth(40, 40, seed=3)
    q = np.full((8, 8), 16.0)
    q[7, 7] = 300.0  # forces Pq=1 two-byte DQT entries
    out = decode_jpeg(encode_jpeg(img, quant_y=q, quant_c=q))
    assert out is not None and out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 12  # lossy, but nowhere near garbage
    # smooth image + low-frequency-preserving table: means survive
    assert abs(float(out.mean()) - float(img.mean())) < 4


def test_greyscale_single_component():
    g = _smooth(24, 24)[:, :, 2]
    img = np.dstack([g, g, g])
    out = decode_jpeg(encode_jpeg(img, greyscale=True))
    assert out.shape == (24, 24, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    # greyscale JPEG carries Y only: compare against the encoder's Y
    y = 0.299 * g + 0.587 * g + 0.114 * g
    assert np.abs(out[..., 0].astype(float) - y).max() <= 3


def test_unsupported_variants_return_none():
    img = _smooth(16, 16)
    payload = bytearray(encode_jpeg(img))
    i = payload.find(b"\xff\xc0")
    # SOF2 header over a baseline full-band scan: malformed progressive
    # (a real progressive stream decodes — see test_progressive_*)
    payload[i + 1] = 0xC2
    assert decode_jpeg(bytes(payload)) is None
    # arithmetic-coded SOF9 is genuinely out of scope
    payload[i + 1] = 0xC9
    assert decode_jpeg(bytes(payload)) is None
    # truncation mid-entropy
    assert decode_jpeg(bytes(encode_jpeg(img))[:40]) in (None,)
    # not a JPEG at all
    assert decode_jpeg(b"\x00\x01\x02\x03") is None
    assert decode_jpeg(None) is None


def test_decode_image_dispatches_jpeg():
    img = _smooth(16, 24)
    out = decode_image(encode_jpeg(img))
    assert out is not None and out.shape == (16, 24, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


# ---------------------------------------------------------------- AVI / MJPEG

def _avi_bytes(frames, us_per_frame=500000):
    """Minimal RIFF AVI: hdrl LIST with an avih header (frame timing),
    movi LIST with one '00dc' chunk per frame."""
    import struct

    def chunk(cc, body):
        return cc + struct.pack("<I", len(body)) + body + \
            (b"\x00" if len(body) & 1 else b"")

    def lst(list_type, body):
        return chunk(b"LIST", list_type + body)

    avih = struct.pack("<I", us_per_frame) + b"\x00" * 52
    hdrl = lst(b"hdrl", chunk(b"avih", avih))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_avi_roundtrip():
    from fstd2pandas_spark.operators.llm.multimodal import parse_avi

    srcs = [_smooth(16, 16, seed=s) for s in range(3)]
    frames = [encode_jpeg(s) for s in srcs]
    parsed = parse_avi(_avi_bytes(frames, us_per_frame=500000))
    assert parsed is not None
    ms_per_frame, got = parsed
    assert ms_per_frame == 500.0
    assert got == frames
    assert parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert parse_avi(b"garbage") is None
    # AVI with no video chunks
    assert parse_avi(_avi_bytes([])) is None


@pytest.fixture(scope="module")
def spark():
    from fstd2pandas_spark import get_spark
    s = get_spark("test-jpeg", master="local[4]", shuffle_partitions=4)
    yield s


def test_sample_video_frames_mjpeg_end_to_end(spark):
    """MJPEG AVI in a video column -> one row per sampled timestamp
    with the real JPEG frame bytes, decodable by decode_image; a
    non-AVI payload falls back to duration_ms metadata with NULL
    frames."""
    from fstd2pandas_spark.operators.llm.multimodal import (
        decode_image, sample_video_frames)

    srcs = [_smooth(16, 16, seed=s) for s in range(3)]
    avi = _avi_bytes([encode_jpeg(s) for s in srcs], us_per_frame=500000)
    df = spark.createDataFrame(
        [(1, "video", "video/x-msvideo", None, None, None, bytearray(avi)),
         (2, "video", None, None, None, 1500, bytearray(b"not a video"))],
        "asset_id long, kind string, mime string, width int, height int, "
        "duration_ms int, payload binary")
    out = sample_video_frames(df, every_ms=500)
    assert "payload" not in out.columns  # frames only, not the video again
    rows = out.collect()

    mine = sorted([r for r in rows if r.asset_id == 1],
                  key=lambda r: r.frame_ts)
    # 3 frames x 500 ms = 1500 ms duration -> ts 0/500/1000
    assert [r.frame_ts for r in mine] == [0, 500, 1000]
    for r, src in zip(mine, srcs):
        img = decode_image(bytes(r.frame_payload))
        assert img is not None
        assert np.abs(img.astype(int) - src.astype(int)).max() <= 3

    other = sorted([r for r in rows if r.asset_id == 2],
                   key=lambda r: r.frame_ts)
    assert [r.frame_ts for r in other] == [0, 500, 1000]
    assert all(r.frame_payload is None for r in other)


# ---------------------------------------------------------------- progressive

def test_progressive_equals_baseline_444():
    """Same quantized coefficients -> the progressive scan script must
    reconstruct EXACTLY the baseline decode, pixel for pixel."""
    from _jpeg_ref import encode_jpeg_progressive

    img = _smooth(40, 56, seed=21)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog is not None
    np.testing.assert_array_equal(prog, base)


def test_progressive_equals_baseline_420_quantized():
    from _jpeg_ref import encode_jpeg_progressive

    img = _smooth(37, 43, seed=22)
    q = np.full((8, 8), 8.0)
    base = decode_jpeg(encode_jpeg(img, subsample=True, quant_y=q,
                                   quant_c=q))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample=True,
                                               quant_y=q, quant_c=q))
    np.testing.assert_array_equal(prog, base)


def test_progressive_two_refinement_levels():
    from _jpeg_ref import encode_jpeg_progressive

    img = _smooth(24, 32, seed=23)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, al=2, bands=((1, 2), (3, 20), (21, 63))))
    np.testing.assert_array_equal(prog, base)


def test_progressive_spectral_only_no_refinement():
    from _jpeg_ref import encode_jpeg_progressive

    img = _smooth(29, 35, seed=24)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, al=0,
                                               bands=((1, 63),)))
    np.testing.assert_array_equal(prog, base)


def test_progressive_greyscale():
    from _jpeg_ref import encode_jpeg_progressive

    g = _smooth(21, 19)[:, :, 0]
    img = np.dstack([g, g, g])
    base = decode_jpeg(encode_jpeg(img, greyscale=True))
    prog = decode_jpeg(encode_jpeg_progressive(img, greyscale=True))
    np.testing.assert_array_equal(prog, base)
