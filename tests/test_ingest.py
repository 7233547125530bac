"""WARC ingestion + HTML stripping tests: an in-test WARC writer
(plain and per-record-gzip variants, HTTP response envelopes,
non-response records) drives read_warc end-to-end; html_to_text_col is
checked for script/entity/whitespace behavior."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.llm.ingest import (
    html_to_text_col, read_warc, strip_html)


def _warc_record(wtype, url, body: bytes, rid="<urn:uuid:1>",
                 http=False):
    if http:
        body = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"\r\n" + body)
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: {rid}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2024-01-02T03:04:05Z\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n").encode()
    return head + body + b"\r\n\r\n"


def _shard(records, per_record_gzip=False):
    if per_record_gzip:
        return b"".join(gzip.compress(r) for r in records)
    return b"".join(records)


@pytest.fixture(scope="module")
def spark():
    from fstd2pandas_spark import get_spark
    return get_spark("test-ingest", master="local[4]",
                     shuffle_partitions=4)


def _records():
    return [
        _warc_record("warcinfo", "", b"software: test\r\n"),
        _warc_record("response", "http://a.example/x",
                     "<html><body><p>Hello &amp; welcome</p>"
                     "<script>var x=1;</script></body></html>"
                     .encode(), rid="<urn:uuid:a>", http=True),
        _warc_record("request", "http://a.example/x", b"GET /x\r\n"),
        _warc_record("conversion", "http://b.example/y",
                     "plain text intérieur".encode(),
                     rid="<urn:uuid:b>"),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_read_warc(spark, tmp_path, gz):
    zone = tmp_path / ("warc_gz" if gz else "warc")
    zone.mkdir()
    name = "shard-00000.warc.gz" if gz else "shard-00000.warc"
    (zone / name).write_bytes(_shard(_records(), per_record_gzip=gz))

    docs = read_warc(spark, str(zone)).collect()
    assert len(docs) == 2  # warcinfo + request filtered out
    by_id = {r.record_id: r for r in docs}
    resp = by_id["<urn:uuid:a>"]
    assert resp.warc_type == "response"
    assert resp.url == "http://a.example/x"
    assert resp.content_type.startswith("text/html")
    assert "<script>" in resp.text  # raw body kept; stripping is separate
    conv = by_id["<urn:uuid:b>"]
    assert conv.text == "plain text intérieur"
    assert conv.warc_date == "2024-01-02T03:04:05Z"


def test_read_warc_then_strip(spark, tmp_path):
    zone = tmp_path / "warc2"
    zone.mkdir()
    (zone / "s.warc").write_bytes(_shard(_records()))
    out = strip_html(read_warc(spark, str(zone))
                     .filter(F.col("warc_type") == "response"))
    text = out.select("text").first()[0]
    assert text == "Hello & welcome"


def test_html_to_text_col(spark):
    html = ("<html><head><title>T</title></head><body>"
            "<h1>Title</h1><p>One&nbsp;two &lt;tag&gt;</p>"
            "<!-- hidden --><div>Three</div>"
            "<style>p{color:red}</style>"
            "<ul><li>a</li><li>b</li></ul></body></html>")
    df = spark.createDataFrame([(html,)], "h string")
    text = df.select(html_to_text_col(F.col("h")).alias("t")).first().t
    assert "Title" in text and "One two" in text and "<tag>" in text
    assert "hidden" not in text and "color" not in text and "T\n" not in text
    lines = text.split("\n")
    assert "a" in lines and "b" in lines
    # plan stays a pure projection (no exchange, no Python)
    plan = df.select(html_to_text_col(F.col("h")))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_read_warc_stream_matches_batch(spark, tmp_path):
    """Streaming WARC ingest over a drop zone: the drained sink equals
    the batch read of the same shards."""
    from fstd2pandas_spark.operators.llm.ingest import read_warc_stream
    from fstd2pandas_spark.streaming.record_stream import run_to_memory

    zone = tmp_path / "warc_stream"
    zone.mkdir()
    (zone / "s0.warc").write_bytes(_shard(_records()))
    (zone / "s1.warc.gz").write_bytes(
        _shard(_records(), per_record_gzip=True))

    run_to_memory(read_warc_stream(spark, str(zone)), "warc_sink")
    got = {(r.shard, r.record_id, r.warc_type, r.url, r.text)
           for r in spark.table("warc_sink").collect()}
    want = {(r.shard, r.record_id, r.warc_type, r.url, r.text)
            for r in read_warc(spark, str(zone)).collect()}
    assert got == want and len(want) == 4


def test_inflate_members_gzip_bomb_capped():
    """A hostile gzip member claiming gigabytes must truncate at the
    cap instead of materializing the bomb (truncation-over-OOM, the
    shared decoder contract); well-formed records before the bomb
    still parse."""
    import gzip

    from fstd2pandas_spark.operators.llm.ingest import _inflate_members

    good = gzip.compress(b"WARC/1.0\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    bomb = gzip.compress(b"\x00" * (1 << 22))  # 4 MiB of zeros, ~4 KiB gz
    payload = good + bomb
    out = _inflate_members(payload, max_bytes=1 << 16)  # 64 KiB budget
    assert len(out) <= (1 << 16)
    assert out.startswith(b"WARC/1.0")
    # un-capped result for comparison: the full 4 MiB member
    full = _inflate_members(payload)
    assert len(full) > (1 << 22)


def test_warc_runner_never_raises_on_fuzz():
    """Random and mutated shard bytes must never raise out of the
    per-shard parser (a corrupt crawl shard cannot kill its task)."""
    import gzip
    import random

    import pandas as pd

    from fstd2pandas_spark.operators.llm.ingest import _warc_runner

    rng = random.Random(0xC0FFEE)
    run = _warc_runner({"response", "conversion"})
    valid = gzip.compress(
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nhi"[:5] + b"\r\n\r\n")
    cases = [b"", b"\x1f\x8b", b"\x1f\x8b" + bytes(rng.randrange(256) for _ in range(64)),
             b"WARC/1.0\r\nContent-Length: banana\r\n\r\n",
             b"WARC/1.0\r\n no colon here \r\n\r\n"]
    for _ in range(40):
        b = bytearray(valid)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cases.append(bytes(b))
    for _ in range(40):
        cases.append(bytes(rng.randrange(256)
                           for _ in range(rng.randrange(0, 200))))
    for payload in cases:
        pdf = pd.DataFrame({"path": ["shard"], "content": [payload]})
        for out in run(iter([pdf])):   # must not raise
            assert list(out.columns)[0] == "shard"


def test_warc_negative_length_and_entity_order(spark):
    """ingest.py review pins: (a) a crafted negative Content-Length
    must stop the record walk, not land the cursor back on the same
    record and re-yield it forever (a one-record shard hanging its
    task); (b) '&amp;' decodes LAST — decoding it first double-decoded
    '&amp;lt;' (the HTML spelling of a LITERAL '&lt;') into '<'."""
    from fstd2pandas_spark.operators.llm.ingest import (
        _parse_warc, html_to_text_col)

    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"Content-Length: -13\r\n"
           b"\r\n")
    got = list(_parse_warc(rec * 3))
    assert len(got) <= 1  # stops; never loops re-yielding

    out = spark.range(1).select(html_to_text_col(F.lit(
        "a &amp;lt; b &amp; c &lt; d")).alias("t")).collect()
    assert out[0]["t"] == "a &lt; b & c < d"
