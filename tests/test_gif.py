"""GIF decoder tests: LZW round-trips (including dictionary growth and
width changes on noisy images), interlacing, palettes, animation
composition (delays, sub-rectangle frames, transparency, disposal),
and the decode_image / sample_video_frames integrations."""

from __future__ import annotations

import numpy as np
import pytest

from fstd2pandas_spark.operators.llm.gif import decode_gif, parse_gif
from fstd2pandas_spark.operators.llm.multimodal import decode_image

from _gif_ref import encode_gif


def _pal(n, seed=0):
    return np.random.RandomState(seed).randint(0, 256, size=(n, 3)) \
        .astype(np.uint8)


def test_basic_roundtrip():
    pal = _pal(8, 1)
    idx = np.random.RandomState(2).randint(0, 8, size=(23, 31))
    got = decode_gif(encode_gif([idx], pal))
    assert np.array_equal(got, pal[idx])


def test_noise_exercises_lzw_width_growth():
    """A large noisy image grows the LZW dictionary through several
    code-width increases (and can hit the 4096 reset)."""
    pal = _pal(64, 3)
    idx = np.random.RandomState(4).randint(0, 64, size=(120, 131))
    got = decode_gif(encode_gif([idx], pal))
    assert np.array_equal(got, pal[idx])


def test_two_color_min_code_floor():
    """1-bit palettes still use the spec's LZW minimum code size 2."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.random.RandomState(5).randint(0, 2, size=(17, 13))
    got = decode_gif(encode_gif([idx], pal))
    assert np.array_equal(got, pal[idx])


def test_interlaced():
    pal = _pal(16, 6)
    idx = np.random.RandomState(7).randint(0, 16, size=(29, 18))
    got = decode_gif(encode_gif([idx], pal, interlace=True))
    assert np.array_equal(got, pal[idx])


def test_animation_composition():
    """Frame 2 draws a sub-rectangle with transparency over frame 1;
    parse_gif returns the COMPOSED canvases and the delays."""
    pal = _pal(8, 8)
    base = np.random.RandomState(9).randint(1, 8, size=(20, 24))
    patch = np.random.RandomState(10).randint(1, 8, size=(6, 5))
    patch[2, 2] = 0  # transparent index -> shows frame 1 beneath
    gif = encode_gif([base, patch], pal, delays_cs=[50, 25],
                     transparent=0, offsets=[(0, 0), (3, 4)],
                     canvas=(20, 24))
    parsed = parse_gif(gif)
    assert parsed is not None
    delays, frames = parsed
    assert delays == [500, 250]
    np.testing.assert_array_equal(frames[0], pal[base])
    want = pal[base].copy()
    region = pal[patch]
    region[2, 2] = pal[base][4 + 2, 3 + 2]  # transparent pixel
    want[4:10, 3:8] = region
    np.testing.assert_array_equal(frames[1], want)


def test_malformed_returns_none():
    pal = _pal(4, 11)
    idx = np.random.RandomState(12).randint(0, 4, size=(9, 9))
    gif = encode_gif([idx], pal)
    assert parse_gif(gif[:20]) is None
    assert parse_gif(b"GIF89a" + b"\x00" * 4) is None
    assert parse_gif(b"not a gif") is None
    assert parse_gif(None) is None
    # corrupted LZW body must not raise
    bad = bytearray(gif)
    for i in range(40, min(len(bad), 60)):
        bad[i] ^= 0xFF
    out = parse_gif(bytes(bad))
    assert out is None or isinstance(out[1][0], np.ndarray)


def test_decode_image_dispatches_gif():
    pal = _pal(8, 13)
    idx = np.random.RandomState(14).randint(0, 8, size=(11, 12))
    got = decode_image(encode_gif([idx], pal))
    assert np.array_equal(got, pal[idx])


@pytest.fixture(scope="module")
def spark():
    from fstd2pandas_spark import get_spark
    return get_spark("test-gif", master="local[4]", shuffle_partitions=4)


def test_sample_video_frames_animated_gif(spark):
    """An animated GIF in a video column samples real frames: PPM
    payloads of the composed canvases at the requested timestamps."""
    from fstd2pandas_spark.operators.llm.multimodal import (
        sample_video_frames)

    pal = _pal(8, 15)
    f1 = np.random.RandomState(16).randint(0, 8, size=(10, 10))
    f2 = np.random.RandomState(17).randint(0, 8, size=(10, 10))
    f3 = np.random.RandomState(18).randint(0, 8, size=(10, 10))
    gif = encode_gif([f1, f2, f3], pal, delays_cs=[50, 50, 50])
    df = spark.createDataFrame(
        [(1, "video", "image/gif", None, None, None, bytearray(gif))],
        "asset_id long, kind string, mime string, width int, "
        "height int, duration_ms int, payload binary")
    rows = sorted(sample_video_frames(df, every_ms=500).collect(),
                  key=lambda r: r.frame_ts)
    assert [r.frame_ts for r in rows] == [0, 500, 1000]
    for r, src in zip(rows, (f1, f2, f3)):
        img = decode_image(bytes(r.frame_payload))
        np.testing.assert_array_equal(img, pal[src])


def test_gce_delay_applies_to_next_frame_only():
    """A GCE governs only the next rendering block: a GCE-less second
    frame gets the default delay, not the first frame's."""
    pal = _pal(4, 19)
    f1 = np.random.RandomState(20).randint(0, 4, size=(8, 8))
    f2 = np.random.RandomState(21).randint(0, 4, size=(8, 8))
    gif = encode_gif([f1, f2], pal, delays_cs=[50, None])
    delays, frames = parse_gif(gif)
    assert delays == [500, 100]  # second frame: the 100 ms default
