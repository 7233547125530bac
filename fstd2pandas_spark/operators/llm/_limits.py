"""Shared decode-budget limits for the media kernels.

Every decoder allocates output buffers sized from attacker-controlled
header fields (PNG IHDR, GIF logical screen, JPEG SOF, TIFF IFD), so
each validates its total pixel envelope against this budget BEFORE any
allocation — forged-dimension and decompression-bomb payloads must be
cheap to reject, never an OOM (the shared truncation/None-over-crash
contract; cf. ingest.MAX_INFLATED_BYTES for WARC shards).
"""

#: hard ceiling on any single decode's materialized pixel bytes
#: (256 MiB ~ a 9000x9000 RGBA image) — crawl-feature decoding has no
#: business materializing more
MAX_DECODE_BYTES = 1 << 28
