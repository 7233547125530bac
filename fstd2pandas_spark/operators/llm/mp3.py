"""MPEG audio (MP3) frame-header walk — metadata extraction for audio
curation, no PCM decode.

An audio training pipeline rarely needs the decoded waveform at scan
time; it needs to TRIAGE a crawl: is this byte blob really MPEG audio,
how long is it, what bitrate/sample-rate family, is it VBR, do the
declared frames actually fill the file. That is a pure frame-header
walk over the published MPEG-1/2/2.5 audio framing (ISO/IEC 11172-3 /
13818-3: 11-bit sync, version/layer ids, bitrate + sample-rate tables,
per-frame length arithmetic, Xing/Info VBR tag), which this module
implements exactly; actual PCM synthesis (Huffman + IMDCT + polyphase
filterbank) stays the honest content-hash fallback in multimodal.py.

All outputs are integers (frame counts, summed kbps, exact
``samples * 1_000_000 // rate`` microseconds), so an SQL oracle can
predict them from constructed payloads — the WAV/AVI gate precedent.

Scale shape: runs inside the same Arrow-batched mapInPandas kernel as
every other codec — per-document work, no shuffle interaction, and the
walk is O(n_frames) header reads, not O(bytes)."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: kbps by (version_group, layer): MPEG1 L1/L2/L3, MPEG2+2.5 L1/L2&L3
_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224,
             256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112,
             128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96,
             112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112,
             128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56,
             64, 80, 96, 112, 128, 144, 160],
}

_RATES = {3: [44100, 48000, 32000],      # MPEG1
          2: [22050, 24000, 16000],      # MPEG2
          0: [11025, 12000, 8000]}       # MPEG2.5


def _header(b: bytes, off: int):
    """Decode the 4-byte frame header at ``off``; None if any field is
    reserved/invalid (the validity test that doubles as sync
    confirmation)."""
    if off + 4 > len(b):
        return None
    h = int.from_bytes(b[off:off + 4], "big")
    if h >> 21 != 0x7FF:
        return None
    ver = (h >> 19) & 3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 3   # 1=III, 2=II, 3=I
    if ver == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        # free-format (0) needs next-sync length discovery — honest
        # rejection, not a guess; 15 is forbidden
        return None
    vgroup = 1 if ver == 3 else 2
    kbps = _BITRATES[(vgroup,
                      layer if vgroup == 1 else min(layer, 2))][br_idx]
    rate = _RATES[ver][sr_idx]
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3          # 3 = mono
    crc = ((h >> 16) & 1) == 0
    if layer == 1:
        spf = 384
        length = (12 * kbps * 1000 // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        length = spf // 8 * kbps * 1000 // rate + pad
    return {"ver": ver, "layer": layer, "kbps": kbps, "rate": rate,
            "spf": spf, "length": length, "mode": mode, "crc": crc}


def _skip_id3v2(b: bytes) -> int:
    """Offset past a leading ID3v2 container (syncsafe 28-bit size).
    The syncsafe size counts the extended header + frames + padding
    but NOT the 10-byte header, and NOT the 10-byte footer either —
    when the flags byte advertises one (ID3v2.4 §3.1, bit 0x10) the
    skip must add it, or the walk lands 10 bytes short of the first
    frame and leans on the sync scan instead of the documented
    syncsafe skip."""
    if len(b) >= 10 and b[:3] == b"ID3":
        sz = ((b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
              | (b[8] & 0x7F) << 7 | (b[9] & 0x7F))
        # footers exist only in v2.4 — bit 4 is undefined in v2.2/2.3
        # flags, so honoring it there would over-skip into the first
        # frame on tags with garbage flag bytes
        if b[3] == 4 and b[5] & 0x10:
            sz += 10
        return 10 + sz
    return 0


#: how far past the ID3 tag to scan for the first sync (broadcast-era
#: players do the same; an unbounded scan of a non-MP3 blob is wasted
#: work the triage pass should not pay)
MAX_SYNC_SCAN = 65536


def parse_mp3(payload: bytes) -> "dict | None":
    """Walk the frame sequence; None unless at least two consecutive
    valid frames (or one frame covering the whole remaining payload)
    are found — single-header matches in random bytes are too cheap
    (the standard double-sync confirmation). Returns integer fields:
    ``n_frames``, ``rate``, ``spf``, ``mode``, ``kbps_sum`` (per-frame
    sum — avg = kbps_sum/n_frames), ``duration_us`` (exact
    total_samples * 1e6 // rate), ``is_vbr`` (>= 2 distinct frame
    bitrates or a Xing/Info tag), ``xing_frames`` (the tag's declared
    frame count, -1 when absent). The walk stops at the first invalid
    header; a truncated trailing frame is not counted."""
    if not payload or len(payload) < 4:
        return None
    b = bytes(payload)
    start = _skip_id3v2(b)
    if start >= len(b):
        return None
    first = None
    for off in range(start, min(len(b) - 3, start + MAX_SYNC_SCAN)):
        hd = _header(b, off)
        if hd is None:
            continue
        nxt = off + hd["length"]
        if nxt == len(b) or _header(b, nxt) is not None:
            first = off
            break
    if first is None:
        return None
    n = 0
    kbps_sum = 0
    samples = 0
    rates = set()
    brs = set()
    h0 = None
    off = first
    while off + 4 <= len(b):
        hd = _header(b, off)
        if hd is None or off + hd["length"] > len(b):
            break
        if h0 is None:
            h0 = hd
        n += 1
        kbps_sum += hd["kbps"]
        samples += hd["spf"]
        rates.add(hd["rate"])
        brs.add(hd["kbps"])
        off += hd["length"]
    if n == 0 or h0 is None:
        return None
    if len(rates) > 1:
        return None   # a mid-stream rate switch is not one MP3 stream
    # Xing/Info VBR tag: first frame, after the side info whose size
    # depends on version/mode (MPEG1: 17 mono / 32 other; MPEG2/2.5:
    # 9 / 17), plus 4 header + 2 CRC bytes when protected
    xing = -1
    side = (17 if h0["mode"] == 3 else 32) if h0["ver"] == 3 else \
           (9 if h0["mode"] == 3 else 17)
    tag_off = first + 4 + (2 if h0["crc"] else 0) + side
    if tag_off + 8 <= len(b) and b[tag_off:tag_off + 4] in (b"Xing",
                                                            b"Info"):
        flags = int.from_bytes(b[tag_off + 4:tag_off + 8], "big")
        if flags & 1 and tag_off + 12 <= len(b):
            xing = int.from_bytes(b[tag_off + 8:tag_off + 12], "big")
    return {"n_frames": n, "rate": h0["rate"], "spf": h0["spf"],
            "mode": h0["mode"], "kbps_sum": kbps_sum,
            "duration_us": samples * 1_000_000 // h0["rate"],
            "is_vbr": len(brs) > 1 or xing >= 0, "xing_frames": xing}


def mp3_metadata(df: DataFrame) -> DataFrame:
    """``(asset_id, mp3_frames, mp3_rate, mp3_kbps_sum, mp3_dur_us,
    mp3_vbr)`` per asset — NULL metadata (not a dropped row) for
    payloads that are not MPEG audio, so the triage join never loses
    assets. Arrow-batched mapInPandas like every codec kernel."""
    import pandas as pd

    schema = ("asset_id long, mp3_frames long, mp3_rate long, "
              "mp3_kbps_sum long, mp3_dur_us long, mp3_vbr boolean")

    def run(batches):
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                meta = parse_mp3(payload) if payload is not None else None
                if meta is None:
                    out.append((aid, None, None, None, None, None))
                else:
                    out.append((aid, meta["n_frames"], meta["rate"],
                                meta["kbps_sum"], meta["duration_us"],
                                meta["is_vbr"]))
            yield pd.DataFrame(
                out, columns=["asset_id", "mp3_frames", "mp3_rate",
                              "mp3_kbps_sum", "mp3_dur_us", "mp3_vbr"])

    return (df.select("asset_id", "payload")
            .mapInPandas(run, schema=schema))
