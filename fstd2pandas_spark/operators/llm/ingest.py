"""Web-crawl ingestion front: WARC archives -> documents table, and
HTML -> text stripping as native Column expressions.

WARC (ISO 28500, the Common Crawl container) is parsed per shard file:
``spark.read.format("binaryFile")`` gives one row per archive, and an
Arrow-batched ``mapInPandas`` walks the records (gzip members via
stdlib zlib — WARC shards are per-record gzip members, so one pass
inflates them sequentially). One task per shard is the right grain:
WARC gzip is non-splittable, and crawl shards are sized (~1 GB) for
exactly this layout; 100 TB of crawl = ~100k shard tasks.

HTML stripping is a chain of ``regexp_replace`` Column expressions —
JVM-side, whole-stage-codegen, no Python in the hot path — over the
same Java-and-RE2-shared regex subset the scrub layer uses, so an SQL
oracle can reproduce it verbatim.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_DOC_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType(), False),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
])


#: hard ceiling on a shard's total inflated size. Crawl shards are
#: ~1 GiB compressed with bounded ratios; a hostile member (gzip bomb:
#: kilobytes inflating to tens of GiB) must truncate, not OOM the task —
#: the decoders' truncation-over-crash contract (cf. the PNG deflate
#: envelope cap and sample_video_frames' frame cap).
MAX_INFLATED_BYTES = 4 << 30


def _inflate_members(payload: bytes,
                     max_bytes: int = MAX_INFLATED_BYTES) -> bytes:
    """Concatenate all gzip members (WARC shards are one member per
    record); plain payloads pass through. Total inflated output is
    capped at ``max_bytes`` — decompression stops at the cap (records
    already inflated still parse), it does not raise."""
    if payload[:2] != b"\x1f\x8b":
        return payload
    out = []
    total = 0
    view = memoryview(payload)  # slicing bytes would copy the whole
    pos = 0                     # remaining shard PER MEMBER (quadratic)
    while pos < len(view):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            # max_length bounds THIS call's output: a bomb member can
            # only ever materialize the remaining budget, never its
            # claimed size
            chunk = d.decompress(view[pos:], max_bytes - total + 1)
        except zlib.error:
            break
        if total + len(chunk) > max_bytes:
            # the max_length bound above means a capped member yields
            # exactly budget+1 bytes — trim to the budget and stop;
            # records already inflated stay parseable
            out.append(chunk[:max_bytes - total])
            break
        out.append(chunk)
        total += len(chunk)
        consumed = len(view) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def _parse_warc(raw: bytes):
    """Walk WARC records: version line, headers to CRLFCRLF, then
    Content-Length payload bytes + CRLFCRLF separator."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate stray blank lines between records
        while pos < n and raw[pos:pos + 2] == b"\r\n":
            pos += 2
        if not raw[pos:pos + 5] == b"WARC/":
            break
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers = {}
        for line in raw[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        if length < 0:
            # a crafted negative Content-Length could land the cursor
            # back ON this record's own header and re-yield it forever
            # (a one-record shard hanging its task); malformed framing
            # stops the walk — records already yielded stand
            break
        body = raw[head_end + 4:head_end + 4 + length]
        yield headers, body
        pos = head_end + 4 + length


def _http_body(body: bytes) -> "tuple[str | None, bytes]":
    """Split an application/http payload into (Content-Type, body)."""
    if not body.startswith(b"HTTP/"):
        return None, body
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0:
        return None, body
    ctype = None
    for line in body[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("ascii", "replace")
    return ctype, body[head_end + 4:]


def _warc_runner(keep: set):
    """The per-shard mapInPandas body shared by the batch and streaming
    readers — ONE parser, so envelope fixes cannot silently diverge."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = []
                raw = _inflate_members(bytes(row["content"]))
                for headers, body in _parse_warc(raw):
                    wtype = headers.get("warc-type", "").lower()
                    if wtype not in keep:
                        continue
                    ctype, payload = _http_body(body)
                    rows.append({
                        "shard": row["path"],
                        "record_id": headers.get("warc-record-id"),
                        "warc_type": wtype,
                        "url": headers.get("warc-target-uri"),
                        "warc_date": headers.get("warc-date"),
                        "content_type": ctype
                        or headers.get("content-type"),
                        "text": payload.decode("utf-8", "replace"),
                    })
                if rows:
                    yield pd.DataFrame(rows, columns=WARC_DOC_SCHEMA.names)

    return _run


def read_warc(spark: SparkSession, path: str,
              warc_types: "tuple[str, ...]" = ("response", "conversion"),
              ) -> DataFrame:
    """WARC shard files -> one row per kept record: (shard, record_id,
    warc_type, url, warc_date, content_type, text). ``response``
    payloads have their HTTP envelope stripped; body bytes decode as
    UTF-8 with replacement (crawls are full of mojibake — a decode
    error must not kill the shard task)."""
    binary = spark.read.format("binaryFile").load(path)
    keep = {t.lower() for t in warc_types}
    return binary.select("path", "content").mapInPandas(
        _warc_runner(keep), schema=WARC_DOC_SCHEMA)


def html_to_text_col(html: Column) -> Column:
    """HTML -> visible text as pure Column expressions (Java∩RE2 regex
    subset, mirrorable in an ANSI oracle): drop script/style/head
    blocks and comments, break block-level tags to newlines, strip the
    remaining tags, decode the common entities, collapse whitespace."""
    # no backreferences: RE2 (the oracle's engine) has none — one
    # pattern per container keeps the expressions in the shared subset
    x = F.regexp_replace(html, r"(?s)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?s)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<head[^>]*>.*?</head>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(
        x, r"</?(p|div|br|li|tr|h1|h2|h3|h4|h5|h6)[^>]*>", "\n")
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    # '&amp;' decodes LAST: its replacement introduces a bare '&'
    # that must not feed a later entity pass — decoding it first
    # double-decoded '&amp;lt;' (the HTML spelling of a literal
    # '&lt;') into '<' instead of '&lt;'
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")):
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.regexp_replace(x, r"[ \t]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{2,}", "\n")
    # trim() strips spaces only; newlines at the edges need the regex
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def strip_html(df: DataFrame, html_col: str = "text",
               out_col: str = "text") -> DataFrame:
    """Column-level HTML stripping over a document frame — a
    shuffle-free narrow map (scan speed at 100 TB)."""
    return df.withColumn(out_col, html_to_text_col(F.col(html_col)))


def read_warc_stream(spark: SparkSession, path: str,
                     warc_types: "tuple[str, ...]" = ("response",
                                                      "conversion"),
                     max_files_per_trigger: "int | None" = None
                     ) -> DataFrame:
    """Streaming twin of :func:`read_warc`: crawl shards landing in a
    drop zone become a document STREAM (``readStream`` over binary
    files + the same mapInPandas parser — mapInPandas is
    streaming-safe because each shard parses independently). Everything
    per-document downstream (language id, quality, scrubbing,
    html stripping, streaming exact dedup) applies unchanged."""
    # binaryFile's fixed schema must be declared explicitly on a stream
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, "
        "length long, content binary")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    binary = reader.load(path)
    keep = {t.lower() for t in warc_types}
    return binary.select("path", "content").mapInPandas(
        _warc_runner(keep), schema=WARC_DOC_SCHEMA)
