"""The ``.fstrec`` portable record container — this engine's stand-in for
the RPN standard-file binary layout.

The real FST format needs librmn (unavailable here); this container keeps
the *architecturally relevant* properties of it (SURVEY §2.1 S1-S8):

- a **directory of fixed-width packed record headers at the front** of the
  file (like XDF directory pages, std_io.py:656-812) so a metadata scan
  reads a few KB without touching field data;
- **payloads stored after the directory**, one seekable extent per record
  (like the word-address/length pairs swa/lng, std_io.py:722-729), so a
  pruned or filtered read fetches only matching records' bytes;
- float32 payloads, row-major, ni-fastest.

Layout (little-endian):

    magic  b'FSTR0002'
    u32    nrecords
    u32    crc32 of the directory block   (v2; absent in FSTR0001)
    directory: nrecords * HEADER (fixed width, see _HEADER_STRUCT)
    payloads: concatenated float32 arrays

Header fields mirror BASE_COLUMNS; payload extent = (offset, n_floats).

Corruption contract (round 17, the XDF read-path contract applied to
the portable container): a damaged file raises, never returns silently
wrong data — the v2 directory CRC catches any header bit flip, the
``n_floats == ni*nj*nk`` and offset-continuity invariants (write_fstrec
lays payloads out contiguously; update mode never moves extents) catch
extent corruption even on legacy v1 files, and short reads raise on
both the directory and payload paths. Payload bit flips remain
value-undetectable (float payloads carry no checksum — the same limit
as the XDF container and librmn itself). FSTR0001 files stay readable;
new files are always written as FSTR0002.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass

import numpy as np

MAGIC = b"FSTR0002"
MAGIC_V1 = b"FSTR0001"

#: nomvar(4s) typvar(2s) etiket(12s) grtyp(2s) then 17 ints + 2 longs + extent
_HEADER_STRUCT = struct.Struct(
    "<4s2s12s2s"   # strings (space padded)
    "iii"          # ni nj nk
    "q"            # dateo
    "iii"          # ip1 ip2 ip3
    "ii"           # deet npas
    "ii"           # datyp nbits
    "iiii"         # ig1..ig4
    "q"            # datev
    "QI"           # payload offset, n_floats
)

HEADER_SIZE = _HEADER_STRUCT.size
#: v2 prefix: magic + nrecords + directory crc32
_PREFIX = len(MAGIC) + 8
#: legacy v1 prefix: magic + nrecords (no checksum)
_PREFIX_V1 = len(MAGIC_V1) + 4

@dataclass
class RecordHeader:
    nomvar: str
    typvar: str
    etiket: str
    grtyp: str
    ni: int
    nj: int
    nk: int
    dateo: int
    ip1: int
    ip2: int
    ip3: int
    deet: int
    npas: int
    datyp: int
    nbits: int
    ig1: int
    ig2: int
    ig3: int
    ig4: int
    datev: int
    offset: int
    n_floats: int


def _pad(s: "str | None", n: int) -> bytes:
    # NULL string metadata writes as spaces (reads back as ''), never
    # as the literal text 'None' — the xdf pack_dir_entry rule
    return ("" if s is None else str(s)) \
        .encode("ascii", "replace")[:n].ljust(n, b" ")


#: write-path spill threshold: once a partition's accumulated payload
#: exceeds this many bytes, the packed float32 bytes stream to a
#: sidecar file instead of the in-memory chunk list
_SPILL_BYTES = 64 * 1024 * 1024


def _validated_payload(rec: dict) -> np.ndarray:
    """Validate one record's data array -> little-endian float32."""
    if rec.get("d") is None:
        # a metadata-only frame (with_data=false read) must not be
        # persisted as a dataless container that still claims
        # ni x nj x nk — mirror write_xdf's validation
        raise ValueError(
            f"record {rec.get('nomvar')!r} has no data array 'd'; "
            "metadata-only tables cannot be written as containers "
            "(use update mode for metadata edits)")
    d0 = np.asarray(rec["d"])
    if d0.dtype == object:
        # NULL elements are the engine's MASKED representation
        # (mask.py) — a float cast would die as an opaque numpy
        # TypeError; name the remedy instead
        raise ValueError(
            f"record {rec.get('nomvar')!r}: d contains NULL "
            "(masked) elements — run recover_mask() to split the "
            "record into data + mask before writing")
    d = d0.astype("<f4")
    expect = int(rec["ni"]) * int(rec["nj"]) * int(rec.get("nk", 1))
    if len(d) != expect:
        raise ValueError(
            f"record {rec.get('nomvar')!r}: len(d)={len(d)} != "
            f"ni*nj*nk={expect}")
    return d


def write_fstrec(path: str, records: "list[dict]") -> int:
    """Write records (any iterable of dicts with BASE column keys + 'd'
    list/array) to one .fstrec file. Returns the number written.

    Memory ceiling (round 18): rows are consumed INCREMENTALLY. A Spark
    writer task hands over unpickled Python-float lists that cost ~11x
    the raw payload bytes when a whole partition is held at once
    (measured, PLANS.md); here each row collapses to packed float32
    bytes immediately, and once the running payload passes _SPILL_BYTES
    the bytes stream to a sidecar (``<path>.spill``, removed on every
    exit path), so peak memory is O(one record + headers) regardless of
    partition size. Output is byte-identical to the pre-r18 in-memory
    assembly, and the target file is still only created after EVERY
    record validates (all-or-nothing per file)."""
    metas: "list[tuple]" = []      # packed fields sans extent, + n_floats
    chunks: "list[bytes]" = []
    buf_bytes = 0
    spill = None
    spill_path = path + ".spill"
    try:
        for rec in records:
            d = _validated_payload(rec)
            b = d.tobytes()
            metas.append((
                _pad(rec["nomvar"], 4), _pad(rec["typvar"], 2),
                _pad(rec["etiket"], 12), _pad(rec.get("grtyp", "X"), 2),
                int(rec["ni"]), int(rec["nj"]), int(rec.get("nk", 1)),
                int(rec["dateo"]), int(rec["ip1"]), int(rec["ip2"]),
                int(rec["ip3"]), int(rec["deet"]), int(rec["npas"]),
                int(rec["datyp"]), int(rec["nbits"]),
                int(rec["ig1"]), int(rec["ig2"]), int(rec["ig3"]),
                int(rec["ig4"]), int(rec["datev"]), len(d),
            ))
            if spill is None and buf_bytes + len(b) > _SPILL_BYTES:
                spill = open(spill_path, "wb")
                for c in chunks:
                    spill.write(c)
                chunks = []
            if spill is not None:
                spill.write(b)
            else:
                chunks.append(b)
            buf_bytes += len(b)
        n = len(metas)
        headers = bytearray()
        offset = _PREFIX + HEADER_SIZE * n
        for m in metas:
            headers += _HEADER_STRUCT.pack(*m[:-1], offset, m[-1])
            offset += 4 * m[-1]
        if spill is not None:
            spill.close()
            spill = None
        with open(path, "wb") as f:
            f.write(MAGIC)
            f.write(struct.pack("<I", n))
            f.write(struct.pack("<I", zlib.crc32(bytes(headers))))
            f.write(bytes(headers))
            if chunks:
                for c in chunks:
                    f.write(c)
            elif buf_bytes:
                import shutil

                with open(spill_path, "rb") as sf:
                    shutil.copyfileobj(sf, f, 16 * 1024 * 1024)
        return n
    finally:
        if spill is not None:
            spill.close()
        if os.path.exists(spill_path):
            os.remove(spill_path)


def maybe_fstrec(path: str) -> bool:
    """Magic-bytes sniff (the reference's maybeFST, std_io.py:136-151).
    Accepts the current FSTR0002 layout and legacy FSTR0001 files."""
    try:
        with open(path, "rb") as f:
            return f.read(len(MAGIC)) in (MAGIC, MAGIC_V1)
    except OSError:
        return False


#: numpy mirror of _HEADER_STRUCT (itemsize asserted equal below): one
#: frombuffer turns the whole directory into column arrays — the
#: columnar metadata fast path (round 18; per-record unpack_from +
#: dataclass boxing measured ~4.4 us/record on a 100k-record file)
_HEADER_DTYPE = np.dtype([
    ("nomvar", "S4"), ("typvar", "S2"), ("etiket", "S12"), ("grtyp", "S2"),
    ("ni", "<i4"), ("nj", "<i4"), ("nk", "<i4"), ("dateo", "<i8"),
    ("ip1", "<i4"), ("ip2", "<i4"), ("ip3", "<i4"),
    ("deet", "<i4"), ("npas", "<i4"), ("datyp", "<i4"), ("nbits", "<i4"),
    ("ig1", "<i4"), ("ig2", "<i4"), ("ig3", "<i4"), ("ig4", "<i4"),
    ("datev", "<i8"), ("offset", "<u8"), ("n_floats", "<u4"),
])
assert _HEADER_DTYPE.itemsize == HEADER_SIZE

_STR_FIELDS = (("nomvar", "U4"), ("typvar", "U2"),
               ("etiket", "U12"), ("grtyp", "U2"))
_INT_FIELDS = ("ni", "nj", "nk", "dateo", "ip1", "ip2", "ip3", "deet",
               "npas", "datyp", "nbits", "ig1", "ig2", "ig3", "ig4",
               "datev")


def read_directory_columns(path: str) -> "dict[str, np.ndarray]":
    """Directory -> column arrays, fully vectorized (no per-record
    Python). String columns come back as the RAW space-padded bytes
    (S dtype) — np.char decoding measured ~3.5 us/record, while the
    scan path strips them in Arrow at C speed and the boxed path
    decodes per record anyway. Returns the schema metadata columns
    plus int64 ``offset`` / ``n_floats`` extent columns."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic not in (MAGIC, MAGIC_V1):
            raise ValueError(f"not an fstrec file: {path}")
        head = f.read(8 if magic == MAGIC else 4)
        if len(head) < (8 if magic == MAGIC else 4):
            raise ValueError(f"truncated fstrec file: {path}")
        if magic == MAGIC:
            n, crc = struct.unpack("<II", head)
            prefix = _PREFIX
        else:
            (n,) = struct.unpack("<I", head)
            crc = None
            prefix = _PREFIX_V1
        raw = f.read(HEADER_SIZE * n)
    if len(raw) < HEADER_SIZE * n:
        raise ValueError(
            f"truncated fstrec file {path}: directory claims {n} "
            f"records but the file ends after {len(raw)} bytes of "
            "headers")
    if crc is not None and zlib.crc32(raw) != crc:
        raise ValueError(
            f"corrupt fstrec directory in {path}: CRC32 mismatch — "
            "the header block is bit-damaged")
    arr = np.frombuffer(raw, dtype=_HEADER_DTYPE, count=n)
    cols: "dict[str, np.ndarray]" = {}
    for name, _udt in _STR_FIELDS:
        cols[name] = arr[name]
    for name in _INT_FIELDS:
        cols[name] = arr[name]
    offset = arr["offset"].astype("int64")
    n_floats = arr["n_floats"].astype("int64")
    want = (arr["ni"].astype("int64") * arr["nj"].astype("int64")
            * arr["nk"].astype("int64"))
    expect = (prefix + HEADER_SIZE * n
              + 4 * np.concatenate([[0], np.cumsum(n_floats[:-1])])
              if n else np.zeros(0, dtype="int64"))
    bad_nfl = n_floats != want
    bad_off = offset != expect
    if bad_nfl.any() or bad_off.any():
        # report the FIRST bad record with the boxed path's precedence
        # (n_floats before offset) and its exact error text
        i = int(np.nonzero(bad_nfl | bad_off)[0][0])
        nomvar = bytes(cols["nomvar"][i]).decode(errors="replace").rstrip()
        if bad_nfl[i]:
            raise ValueError(
                f"corrupt fstrec record {nomvar!r} in {path}: extent "
                f"n_floats={int(n_floats[i])} != ni*nj*nk="
                f"{int(want[i])}")
        raise ValueError(
            f"corrupt fstrec record {nomvar!r} in {path}: extent "
            f"offset {int(offset[i])} breaks the contiguous layout "
            f"(expected {int(expect[i])}) — the directory is "
            "bit-damaged")
    cols["offset"] = offset
    cols["n_floats"] = n_floats
    return cols


def read_directory(path: str) -> list[RecordHeader]:
    """Read only the header directory — the metadata-scan fast path
    (std_io.py:698-799's vectorized unpack; payloads untouched).

    Corruption contract (round 17): truncation and header damage raise
    — the v2 CRC covers every directory byte; the ``n_floats ==
    ni*nj*nk`` and offset-continuity invariants hold on BOTH format
    versions, so a flipped extent on a legacy v1 file cannot silently
    map a record onto the wrong payload bytes. (Round 18: the scan
    path reads :func:`read_directory_columns` directly; this boxed
    view serves point reads, update mode and tests.)"""
    cols = read_directory_columns(path)
    return [
        RecordHeader(
            nomvar=cols["nomvar"][i].decode().rstrip(),
            typvar=cols["typvar"][i].decode().rstrip(),
            etiket=cols["etiket"][i].decode().rstrip(),
            grtyp=cols["grtyp"][i].decode().rstrip(),
            ni=int(cols["ni"][i]), nj=int(cols["nj"][i]),
            nk=int(cols["nk"][i]), dateo=int(cols["dateo"][i]),
            ip1=int(cols["ip1"][i]), ip2=int(cols["ip2"][i]),
            ip3=int(cols["ip3"][i]), deet=int(cols["deet"][i]),
            npas=int(cols["npas"][i]), datyp=int(cols["datyp"][i]),
            nbits=int(cols["nbits"][i]), ig1=int(cols["ig1"][i]),
            ig2=int(cols["ig2"][i]), ig3=int(cols["ig3"][i]),
            ig4=int(cols["ig4"][i]), datev=int(cols["datev"][i]),
            offset=int(cols["offset"][i]),
            n_floats=int(cols["n_floats"][i]),
        )
        for i in range(len(cols["nomvar"]))
    ]


def read_payload_at(f, offset: int, n_floats: int,
                    nomvar: str = "?") -> np.ndarray:
    """Seek + read one record's float32 payload by extent scalars (the
    columnar scan path; no header object needed). A truncated payload
    raises instead of silently returning a short array (round 17)."""
    f.seek(offset)
    buf = f.read(n_floats * 4)
    if len(buf) < n_floats * 4:
        raise ValueError(
            f"truncated fstrec record {nomvar!r}: payload needs "
            f"{n_floats * 4} bytes but the file ends after "
            f"{len(buf)}")
    return np.frombuffer(buf, dtype="<f4")


def read_payload(f, header: RecordHeader) -> np.ndarray:
    """Seek + read one record's float32 payload (the point read of
    get_data, std_io.py:463-475)."""
    return read_payload_at(f, header.offset, header.n_floats,
                           header.nomvar)


def update_metadata(path: str, updates: "dict[int, dict]") -> int:
    """In-place metadata edit by 1-based record key — the reference's
    ``update`` mode (std_writer.py:100-125 via ``fst_edit_dir``). Payload
    extents are never touched; only header metadata fields change.
    Returns the number of edited records."""
    headers = read_directory(path)
    # validate EVERYTHING before the first write so a bad key or field
    # name cannot leave the file half-edited (all-or-nothing per file)
    for key, fields in updates.items():
        if not 1 <= key <= len(headers):
            raise KeyError(f"record key {key} not in {path}")
        for name in fields:
            if name in ("offset", "n_floats", "d"):
                raise ValueError(f"cannot update {name} in-place")
            if name in ("ni", "nj", "nk"):
                # editing the shape without editing the payload would
                # break the n_floats == ni*nj*nk read invariant — the
                # re-stamped CRC would bless a header every later
                # read_directory() rejects, permanently bricking the
                # container. The engine's own UPDATE path already
                # excludes these; forbid them here too.
                raise ValueError(
                    f"cannot update {name} in-place: the payload extent "
                    "is fixed, so a shape edit would make the file "
                    "unreadable (rewrite the record instead)")
            if not hasattr(headers[key - 1], name):
                raise KeyError(f"unknown metadata field {name}")
    edited = 0
    with open(path, "r+b") as f:
        magic = f.read(len(MAGIC))
        prefix = _PREFIX if magic == MAGIC else _PREFIX_V1
        for key, fields in updates.items():
            h = headers[key - 1]
            for name, value in fields.items():
                setattr(h, name, value)
            f.seek(prefix + (key - 1) * HEADER_SIZE)
            f.write(_HEADER_STRUCT.pack(
                _pad(h.nomvar, 4), _pad(h.typvar, 2), _pad(h.etiket, 12),
                _pad(h.grtyp, 2), int(h.ni), int(h.nj), int(h.nk),
                int(h.dateo), int(h.ip1), int(h.ip2), int(h.ip3),
                int(h.deet), int(h.npas), int(h.datyp), int(h.nbits),
                int(h.ig1), int(h.ig2), int(h.ig3), int(h.ig4),
                int(h.datev), h.offset, h.n_floats,
            ))
            edited += 1
        if magic == MAGIC and edited:
            # re-stamp the directory CRC over the edited header block
            f.seek(prefix)
            raw = f.read(HEADER_SIZE * len(headers))
            f.seek(len(MAGIC) + 4)
            f.write(struct.pack("<I", zlib.crc32(raw)))
    return edited


def list_fstrec_files(path: str) -> list[str]:
    """Expand a path/directory/glob to .fstrec files."""
    import glob as _glob

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, p) for p in os.listdir(path)
            if p.endswith(".fstrec")
        )
    if any(ch in path for ch in "*?["):
        return sorted(p for p in _glob.glob(path) if maybe_fstrec(p))
    return [path]
