"""Turbo-pack payload codec family for packed/compressed FST datyps.

Codes (reference DATYP_DICT __init__.py:94-108; +128 = armn_compress):
1 'R' / 6 'F' legacy packed floats (quantize, no entropy layer);
129 'R' / 134 'F' compressed quantized floats; 130 'I' unsigned /
132 'S' signed compressed ints; 133 'E' compressed IEEE float32.

Real operational FST files overwhelmingly carry ``datyp 134`` (float
fields quantized by librmn's ``c_float_packer`` then entropy-reduced by
``armn_compress``) and ``datyp 130`` (unsigned-short fields through
``armn_compress`` alone).  The reference reads these through librmn's C
codecs (reference std_io.py:550-560 routes 130/134 into
``armn_compress`` + ``c_float_unpacker``; DATYP_DICT
``__init__.py:94-108`` names the codes).  This module implements the
same two-stage scheme — power-of-two float quantization, then a 2-D
Lorenzo-predictor + block-adaptive bit-packing entropy layer — in pure
numpy, from the publicly documented design (predict-from-neighbours,
zigzag residuals, per-block token widths).  It is a faithful member of
the same codec family and round-trips bit-exactly through itself; it
does NOT claim byte-compatibility with librmn's exact bitstream (no
librmn here to verify against), which is why the container keeps the
payload self-describing.

Stage 1 — quantization (datyp 134 only; mirrors float_packer's
exponent-aligned fixed point):

* ``m = min(d)``, residual ``r = d - m`` in float64
* ``exp0 = floor(log2(max(r)))``; quantum ``q = 2**(exp0 - nbits + 1)``
* tokens ``t = round(r / q)`` — at most ``nbits`` bits each, and exact
  (zero loss) whenever the values are integers spanning < 2**nbits
  quanta, the shape of every gated round-trip fixture.

Stage 2 — entropy layer (datyps 130 and 134):

* 2-D Lorenzo predictor over the (nj*nk, ni) grid:
  ``e[j,i] = t[j,i] - t[j,i-1] - t[j-1,i] + t[j-1,i-1]`` (zero outside),
  inverted exactly by a row-then-column prefix sum — both directions
  are whole-array numpy ops, no per-cell Python.
* zigzag map to unsigned, then blocks of 32 residuals packed at the
  block's own maximal bit width (6-bit width prefix per block).

Payload word layout (big-endian u32, self-describing)::

    w0  ntokens (= ni*nj*nk)
    w1  (qnbits << 24) | (exp0 + 4096)      # exp0 biased signed
    w2  min value, IEEE float64 high word    # 0 for datyp 130
    w3  min value, IEEE float64 low word
    w4  bitstream word count
    w5+ bitstream (width-prefixed blocks, zero-padded to a word)
"""

from __future__ import annotations

import numpy as np

#: residuals of nbits-bit tokens fit nbits+2 bits after zigzag
_WIDTH_BITS = 6
_BLOCK = 32
_EXP_BIAS = 4096

COMPRESSED_DATYPS = (129, 130, 132, 133, 134)
#: legacy non-compressed packed codes: floats 1 'R' / 6 'F' (exponent-
#: aligned fixed point) and sub-word ints 2 'I' / 4 'S' at nbits < 32 —
#: all at adaptive block widths, no entropy layer
PACKED_DATYPS = (1, 2, 4, 6)
#: every datyp whose payload carries the self-describing codec header
SELF_DESCRIBING_DATYPS = PACKED_DATYPS + COMPRESSED_DATYPS


def is_codec_datyp(datyp: int, nbits: int) -> bool:
    """True when (datyp, nbits) routes through this codec rather than a
    transparent word layout: every compressed code, the packed floats,
    and sub-word ints (2/4 at nbits < 32 — at 32 they are transparent)."""
    if datyp in COMPRESSED_DATYPS or datyp in (1, 6):
        return True
    return datyp in (2, 4) and nbits < 32


# ---------------------------------------------------------------------------
# stage 1 — float quantization (c_float_packer analogue)
# ---------------------------------------------------------------------------

def quantize(d: np.ndarray, nbits: int) -> "tuple[float, int, np.ndarray]":
    """Float array -> (min, exp0, uint tokens of <= nbits bits)."""
    r = np.asarray(d, dtype="float64")
    m = float(r.min()) if r.size else 0.0
    r = r - m
    maxr = float(r.max()) if r.size else 0.0
    if maxr <= 0.0:
        return m, 0, np.zeros(r.size, dtype="int64")
    exp0 = int(np.floor(np.log2(maxr)))
    q = 2.0 ** (exp0 - nbits + 1)
    tokens = np.rint(r / q).astype("int64")
    # rint can land exactly on 2**nbits when maxr sits on the upper edge
    np.clip(tokens, 0, (1 << nbits) - 1, out=tokens)
    return m, exp0, tokens


def dequantize(m: float, exp0: int, tokens: np.ndarray, nbits: int
               ) -> np.ndarray:
    q = 2.0 ** (exp0 - nbits + 1)
    return (tokens.astype("float64") * q + m).astype("<f4")


# ---------------------------------------------------------------------------
# stage 2 — Lorenzo predictor + zigzag (armn_compress analogue)
# ---------------------------------------------------------------------------

def _residuals(tokens: np.ndarray, ni: int) -> np.ndarray:
    t = tokens.reshape(-1, ni)
    e = np.zeros_like(t)
    e[:, :] = t
    e[:, 1:] -= t[:, :-1]
    e[1:, :] -= t[:-1, :]
    e[1:, 1:] += t[:-1, :-1]
    return e.reshape(-1)


def _unresiduals(e: np.ndarray, ni: int) -> np.ndarray:
    t = e.reshape(-1, ni).cumsum(axis=0).cumsum(axis=1)
    return t.reshape(-1)


def _zigzag(e: np.ndarray) -> np.ndarray:
    # (e << 1) ^ (e >> 63): branch-free zigzag (arithmetic shift makes
    # the XOR mask all-ones exactly for negatives); bit-identical to
    # the np.where form across the full wrap range, two ops not three
    e = np.asarray(e, dtype="int64")
    return ((e << 1) ^ (e >> 63)).astype("uint64")


def _unzigzag(u: np.ndarray) -> np.ndarray:
    # (u >> 1) ^ -(u & 1): the branch-free zigzag inverse — for even u
    # the XOR mask is 0 (u/2), for odd u it is all-ones (~(u>>1) =
    # -((u+1)/2)); two whole-array ops vs np.where's three temporaries
    u = u.astype("int64")
    return (u >> 1) ^ -(u & 1)


#: exact integer bit_length for uint64 arrays: count of powers of two
#: <= x (float log2 would mis-round near 2**53+)
_POWS64 = (np.uint64(1) << np.arange(64, dtype="uint64"))


def _block_bits(toks2d: np.ndarray, w: int) -> np.ndarray:
    """(nsel, _BLOCK) uint64 tokens -> (nsel, _BLOCK*w) uint8 bits,
    each token MSB-first, via C-speed unpackbits on the big-endian
    byte view (no per-token shift broadcast)."""
    nsel = len(toks2d)
    by = np.ascontiguousarray(toks2d, dtype=">u8").view("uint8") \
        .reshape(nsel, _BLOCK, 8)
    bits = np.unpackbits(by, axis=-1)          # (nsel, _BLOCK, 64)
    return np.ascontiguousarray(bits[:, :, 64 - w:]) \
        .reshape(nsel, _BLOCK * w)


def _pack_bits(u: np.ndarray) -> np.ndarray:
    """Width-prefixed block bitstream -> big-endian u32 words.

    Vectorized per DISTINCT width (round 18): all widths come from one
    exact searchsorted bit-length, each width group's segments (6-bit
    prefix + unpackbits token matrix) build as whole arrays, and one
    ragged GATHER (repeat(delta) + arange) reassembles the groups into
    block order — no per-bit scatter. Replaces a per-block loop
    measured at ~7-9 MiB/s of raw payload with ~30 MiB/s steady-state
    (same-process A/B, byte-identical output; PLANS.md round 18). An
    earlier r9-era "vectorized" attempt lost 2.5x to the loop because
    it SCATTERED per-token bit matrices into the output — the gather
    formulation is what makes this one win; keep that distinction if
    revisiting. The final (possibly short) block packs alone on the
    scalar path.
    """
    n = len(u)
    if n == 0:
        return np.zeros(0, dtype=">u4")
    u = np.ascontiguousarray(u, dtype="uint64")
    nblocks = -(-n // _BLOCK)
    nlast = n - (nblocks - 1) * _BLOCK
    up = u if n == nblocks * _BLOCK else np.concatenate(
        [u, np.zeros(nblocks * _BLOCK - n, dtype="uint64")])
    blocks = up.reshape(nblocks, _BLOCK)
    widths = np.searchsorted(_POWS64, blocks.max(axis=1),
                             side="right").astype("int64")
    wmax = int(widths.max())
    if wmax > (1 << _WIDTH_BITS) - 1:
        # the 6-bit width prefix tops out at 63: a wider token
        # (int64-wrapped zigzag of an out-of-range residual) would
        # silently encode width w % 64 and decode to garbage
        raise ValueError(
            f"turbo-pack block token needs {wmax} bits, above the "
            f"{(1 << _WIDTH_BITS) - 1}-bit block-width ceiling — "
            "input values exceed the codec's range for this nbits")
    ns = np.full(nblocks, _BLOCK, dtype="int64")
    ns[-1] = nlast
    lens = _WIDTH_BITS + ns * widths
    out_starts = np.zeros(nblocks, dtype="int64")
    np.cumsum(lens[:-1], out=out_starts[1:])
    total = int(lens.sum())
    nfull = nblocks - 1 if nlast < _BLOCK else nblocks

    gparts, gsel, glens = [], [], []
    for w in np.unique(widths[:nfull]):
        w = int(w)
        sel = np.nonzero(widths[:nfull] == w)[0]
        pre = np.broadcast_to(
            ((w >> np.arange(_WIDTH_BITS - 1, -1, -1)) & 1).astype("uint8"),
            (len(sel), _WIDTH_BITS))
        if w:
            seg = np.concatenate([pre, _block_bits(blocks[sel], w)], axis=1)
        else:
            seg = np.ascontiguousarray(pre)
        gparts.append(seg.ravel())
        gsel.append(sel)
        glens.append(np.full(len(sel), _WIDTH_BITS + _BLOCK * w,
                             dtype="int64"))
    if gparts:
        gbits = np.concatenate(gparts) if len(gparts) > 1 else gparts[0]
        sel_all = np.concatenate(gsel)
        lens_g = np.concatenate(glens)
        src_starts = np.zeros(len(sel_all), dtype="int64")
        np.cumsum(lens_g[:-1], out=src_starts[1:])
        # out position p inside block b reads gbits[p + delta[b]]
        delta = np.empty(nfull, dtype="int32")
        delta[sel_all] = (src_starts - out_starts[sel_all]).astype("int32")
        total_full = int(lens_g.sum())
        out_full = gbits[np.repeat(delta, lens[:nfull].astype("int32"))
                         + np.arange(total_full, dtype="int32")]
    else:
        out_full = np.zeros(0, dtype="uint8")
    pieces = [out_full]
    if nfull < nblocks:
        w = int(widths[-1])
        pieces.append(((w >> np.arange(_WIDTH_BITS - 1, -1, -1)) & 1
                       ).astype("uint8"))
        if w:
            blk = up[(nblocks - 1) * _BLOCK:][:nlast]
            tb = ((blk[:, None] >> np.arange(w - 1, -1, -1, dtype="uint64")
                   [None, :]) & np.uint64(1)).astype("uint8")
            pieces.append(tb.reshape(-1))
    bits = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
    if len(bits) != total:   # internal layout invariant, never data-dependent
        raise AssertionError(
            f"turbo-pack assembly produced {len(bits)} bits, expected {total}")
    pad = (-len(bits)) % 32
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype="uint8")])
    return np.frombuffer(np.packbits(bits).tobytes(), dtype=">u4").copy()


def _unpack_bits(words: np.ndarray, ntokens: int) -> np.ndarray:
    """Width-prefixed block bitstream -> uint64 tokens.

    Two-pass decode (round 18; the old per-block numpy loop measured
    ~10 MiB/s of raw payload — a 150x penalty vs the transparent scan,
    PLANS.md): pass 1 walks the width prefixes in plain Python (each
    block's position depends on every previous width, so this pass is
    inherently serial — but it is O(6 int ops) per 32-token block,
    ~3 ms/Mi-token); pass 2 extracts all tokens of each DISTINCT width
    vectorized — an 8-byte little window is gathered per token via a
    sliding-window view, read as one big-endian u64 and shifted/masked
    in whole-array ops (no per-bit matrix). Fields quantized to one
    width (the overwhelmingly common case: every block of a random
    field carries the same max width) take a scatter-free fast path.
    Tokens wider than 56 bits cannot ride an 8-byte window past a
    7-bit phase offset; those rare blocks (nbits > 54 after zigzag
    headroom) fall back to the per-bit matmul."""
    if not ntokens:
        return np.zeros(0, dtype="uint64")
    raw = words.tobytes()
    nblocks = -(-ntokens // _BLOCK)
    nlast = ntokens - (nblocks - 1) * _BLOCK
    starts = np.empty(nblocks, dtype="int64")
    widths = np.empty(nblocks, dtype="int64")
    pos = 0
    nbytes = len(raw)
    for b in range(nblocks):
        byte = pos >> 3
        if byte >= nbytes:
            raise ValueError("truncated turbo-pack bitstream")
        pair = (raw[byte] << 8) | (raw[byte + 1] if byte + 1 < nbytes else 0)
        w = (pair >> (10 - (pos & 7))) & 0x3F
        pos += _WIDTH_BITS
        starts[b] = pos
        widths[b] = w
        pos += (_BLOCK if b < nblocks - 1 else nlast) * w
    if pos > nbytes * 8:
        raise ValueError("truncated turbo-pack bitstream")
    buf = np.frombuffer(raw + b"\x00" * 8, dtype="uint8")
    win = np.lib.stride_tricks.sliding_window_view(buf, 8)
    koff = np.arange(_BLOCK, dtype="int64")
    distinct = np.unique(widths)

    def _extract(s: np.ndarray, w: int) -> np.ndarray:
        if w <= 56:
            v = win[s >> 3].view(">u8").ravel().astype("uint64")
            shift = np.uint64(64 - w) - (s & 7).astype("uint64")
            return (v >> shift) & np.uint64((1 << int(w)) - 1)
        bits = np.unpackbits(buf)
        idx = s[:, None] + np.arange(w, dtype="int64")[None, :]
        return bits[idx].astype("uint64") @ (
            np.uint64(1) << np.arange(w - 1, -1, -1, dtype="uint64"))

    if len(distinct) == 1:
        w = int(distinct[0])
        if w == 0:
            return np.zeros(ntokens, dtype="uint64")
        # token order == block-major ravel order; phantom tail entries
        # of a short final block land after the real ones, so a plain
        # [:ntokens] trim is exact — no scatter needed
        s = (starts[:, None] + koff[None, :] * w).ravel()[:ntokens]
        return _extract(s, w)
    u = np.zeros(ntokens, dtype="uint64")
    for w in distinct:
        if w == 0:
            continue
        sel = np.nonzero(widths == w)[0]
        s = (starts[sel][:, None] + koff[None, :] * int(w)).ravel()
        tpos = (sel[:, None] * _BLOCK + koff[None, :]).ravel()
        if sel[-1] == nblocks - 1 and nlast < _BLOCK:
            keep = tpos < ntokens
            s, tpos = s[keep], tpos[keep]
        u[tpos] = _extract(s, int(w))
    return u


# ---------------------------------------------------------------------------
# record-level API (the writer/reader entry points)
# ---------------------------------------------------------------------------

def compress_payload(d: np.ndarray, ni: int, nj: int, nk: int,
                     datyp: int, nbits: int) -> np.ndarray:
    """Record data -> self-describing big-endian u32 payload words."""
    if not 0 < nbits <= 61:
        # zigzagged Lorenzo residuals of nbits-bit tokens need nbits+2
        # bits; the 6-bit block width prefix tops out at 63
        raise ValueError(
            f"turbo-pack nbits must be in [1, 61], got {nbits}")
    d = np.asarray(d)
    entropy = datyp in COMPRESSED_DATYPS
    if datyp in (134, 129, 1, 6):
        # quantized floats: 134/129 add the Lorenzo entropy layer,
        # 1/6 pack the raw tokens (legacy R/F, std_io.py DATYP_DICT)
        m, exp0, tokens = quantize(d, nbits)
    elif datyp in (130, 2):
        tokens = np.rint(np.asarray(d, dtype="float64")).astype("int64")
        if tokens.size and (tokens.min() < 0 or
                            tokens.max() >= (1 << nbits)):
            raise ValueError(
                f"datyp {datyp} tokens out of the {nbits}-bit unsigned range")
        m, exp0 = 0.0, 0
    elif datyp in (132, 4):
        # signed ints; the packed (4) variant zigzags so the raw block
        # packer sees unsigned tokens
        tokens = np.rint(np.asarray(d, dtype="float64")).astype("int64")
        lim = 1 << max(nbits - 1, 1)
        if tokens.size and (tokens.min() < -lim or tokens.max() >= lim):
            raise ValueError(
                f"datyp {datyp} tokens out of the {nbits}-bit signed range")
        if datyp == 4:
            tokens = _zigzag(tokens).astype("int64")
        m, exp0 = 0.0, 0
    elif datyp == 133:
        # compressed IEEE: the float32 bit patterns are the tokens
        if nbits > 32:
            raise ValueError("datyp 133 packs float32; nbits must be <= 32")
        tokens = np.ascontiguousarray(
            np.asarray(d, dtype="<f4")).view("<u4").astype("int64")
        m, exp0 = 0.0, 0
    else:
        raise NotImplementedError(f"datyp {datyp} is not a turbo-pack code")
    if entropy:
        stream = _pack_bits(_zigzag(_residuals(tokens, ni)))
    else:
        stream = _pack_bits(tokens.astype("uint64"))
    head = np.zeros(5, dtype=">u4")
    head[0] = tokens.size
    head[1] = ((nbits & 0xFF) << 24) | ((exp0 + _EXP_BIAS) & 0xFFFFFF)
    mbits = np.frombuffer(np.float64(m).tobytes(), dtype="<u4")
    head[2], head[3] = int(mbits[1]), int(mbits[0])   # high, low word
    head[4] = len(stream)
    return np.concatenate([head, stream]).astype(">u4")


def decompress_payload(words: np.ndarray, ni: int, nj: int, nk: int,
                       datyp: int, nbits: int) -> np.ndarray:
    """Inverse of compress_payload -> float32 record data.

    The 5-word header is validated against the record dims BEFORE any
    bit-unpacking: an authentic librmn-compressed (ARMN/zfst) payload —
    which this repo deliberately does not implement (reference
    fstpy/std_io.py:463-475 delegates to the librmn C library) — fails
    these checks and raises instead of decoding to wrong data. See
    README "FST binary compatibility boundary".
    """
    if len(words) < 5:
        raise ValueError(
            f"compressed payload too short ({len(words)} words); not a "
            "turbo-pack stream — librmn-compressed records are not supported")
    head = words[:5].astype("int64")
    ntokens = int(head[0])
    qnbits = int(head[1]) >> 24
    exp0 = (int(head[1]) & 0xFFFFFF) - _EXP_BIAS
    m = float(np.frombuffer(
        np.array([head[3], head[2]], dtype="<u4").tobytes(), dtype="<f8")[0])
    if ntokens != ni * nj * nk or not 0 < qnbits <= 61 \
            or int(head[4]) > len(words) - 5:
        raise ValueError(
            f"turbo-pack header mismatch (ntokens={ntokens} vs dims "
            f"{ni}x{nj}x{nk}, width={qnbits}, stream={int(head[4])}/"
            f"{len(words) - 5} words): this is not a stream written by "
            "this repo — authentic librmn-compressed (ARMN/zfst) records "
            "are not supported")
    stream = words[5:5 + int(head[4])]
    u = _unpack_bits(np.asarray(stream, dtype=">u4"), ntokens)
    if datyp in COMPRESSED_DATYPS:
        tokens = _unresiduals(_unzigzag(u), ni)
    elif datyp == 4:            # packed signed: undo the zigzag
        tokens = _unzigzag(u)
    else:                       # 1/6/2: raw fixed-point / uint tokens
        tokens = u.astype("int64")
    if datyp in (134, 129, 1, 6):
        return dequantize(m, exp0, tokens, qnbits)
    if datyp == 133:
        return tokens.astype("<u4").view("<f4")
    return tokens.astype("<f4")     # 130/2 unsigned, 132/4 signed ints


def compressed_payload_length(f, offset: int) -> int:
    """Peek a compressed record's total payload word count (header +
    bitstream) so the reader can size its read without librmn's lng."""
    f.seek(offset)
    head = np.frombuffer(f.read(5 * 4), dtype=">u4")
    if len(head) < 5:
        # a truncated file would otherwise die as an opaque IndexError
        raise ValueError(
            "truncated FST/XDF record: file ends inside the compressed "
            "payload's 5-word header")
    return 5 + int(head[4])
