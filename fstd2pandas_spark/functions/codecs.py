"""RMN codec algorithms as native Spark Column expressions.

Two bit-level codecs underpin the whole metadata layer:

1. **CMC date-time stamps** (reference: std_dec.py:172-187 via RPNDate;
   raw-header decode std_io.py:781-786). The operational ("new", post-1980)
   stamp encodes ``units5`` = number of 5-second intervals since
   1980-01-01T00:00:00 UTC as::

       stamp = 123200000 + (units5 div 8) * 10 + (units5 mod 8)

   i.e. the last decimal digit holds 3 bits (0..7) and the rest counts
   40-second blocks. The raw directory word is linear
   (``raw = units5 + 98560000``), which is why consecutive records "increase
   in 5-second intervals" (std_io.py:783-786) and
   ``stamp = (raw >> 3)*10 + (raw & 7)``. Verified against the reference
   doctest anchor ``442998800 -> 2020-07-14T12:00`` (std_dec.py:180-182).
   Dummy stamps ``{0, 10101011}`` decode to NULL.

2. **convertIp packing** (reference delegates to librmn ``convertIp``;
   call sites std_io.py:820-872, std_enc.py:59-117). New style
   (ip > 32767)::

       ip = (kind << 24) | (exp << 20) | mantissa
       value = signed(mantissa) * 10^(4 - exp)

   where mantissa in [0, 999999] and 1000000+m encodes -m (m <= 48575); encode
   normalizes |value| into [100000, 999999] by choosing exp in [0, 15]
   starting at 4. Verified anchors: 94733000 -> (0.36116, kind 5)
   (std_dec.py:201-203) and hybrid-surface 93423264 -> (1.0, kind 5).
   Old style (ip < 32768) by range: [0, 2000) pressure mb kind 2;
   [2000, 12000] sigma (ip-2000)/10000 kind 1; (12000, 32000] height
   5*(ip-12001) m kind 0; >32000 arbitrary kind 3.

Everything is pure integer/float arithmetic -> expressible both as Spark
Column expressions (JVM-side, codegen) and as ANSI SQL for the DuckDB
oracle. Python scalar versions (``*_py``) are provided for tests and for
the write path's row construction.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_1980 = 315532800          # unix seconds of 1980-01-01T00:00:00Z
_STAMP_BASE = 123200000
_DUMMY_STAMPS = (0, 10101011)


# ---------------------------------------------------------------------------
# date stamps
# ---------------------------------------------------------------------------

def stamp_to_timestamp(stamp: Column) -> Column:
    """Decode a CMC date-time stamp column to a UTC wall time
    (TIMESTAMP_NTZ; NULL for dummy stamps). NTZ, not LTZ (round 17):
    an RMN stamp is a UTC wall time by definition, and an LTZ instant
    renders through spark.sql.session.timeZone at every collection /
    date_format — decoded dates silently shifted under a non-UTC
    session. Streaming consumers that need TimestampType for
    watermarks cast explicitly (record_stream.with_event_time).

    New-style stamps (post-1980, >= _STAMP_BASE) use the linear 5-second
    encoding. Old-format stamps below the base carry AAMMJJHH decimal
    digits (AA = year - 1900) — the encoding the reference reaches
    through RPNDate's old-format branch (std_dec.py:172-187; librmn
    newdate op=+3). Unparseable old stamps decode to NULL, not garbage.
    """
    x = stamp - F.lit(_STAMP_BASE)
    units5 = (x / 10).cast("long") * 8 + (x % 10)
    secs = F.lit(_EPOCH_1980) + units5 * 5
    yy = F.floor(stamp / 1000000).cast("int")
    mm = (F.floor(stamp / 10000) % 100).cast("int")
    dd = (F.floor(stamp / 100) % 100).cast("int")
    hh = (stamp % 100).cast("int")
    old_ts = F.try_make_timestamp_ntz(
        yy + F.lit(1900), mm, dd, hh, F.lit(0), F.lit(0))
    new_ts = F.timestamp_add(
        "SECOND", secs.cast("long"),
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"))
    return (
        F.when(stamp.isin(*_DUMMY_STAMPS) | (stamp <= 0),
               F.lit(None).cast("timestamp_ntz"))
        .when(stamp >= F.lit(_STAMP_BASE), new_ts)
        .otherwise(old_ts)
    )


def timestamp_to_stamp(ts: Column, ts_dtype: "str | None" = None) -> Column:
    """Encode a UTC wall-time column (TIMESTAMP_NTZ / DATE / string —
    stamp_to_timestamp's inverse) to a CMC date-time stamp. Computed
    from the wall-time fields, never the session clock (round 17:
    ``unix_timestamp`` routed through spark.sql.session.timeZone).

    For a TIMESTAMP (LTZ) column — an INSTANT, e.g. the streaming
    plane's watermark-cast ``event_time`` — pass
    ``ts_dtype="timestamp"``: the epoch then comes from the TZ-free
    DECIMAL cast (instant -> UTC wall seconds). The default path casts
    its input to TIMESTAMP_NTZ, and Spark routes an implicit LTZ->NTZ
    cast through ``spark.sql.session.timeZone`` — exactly the session
    dependence the wall-field arithmetic removes (the dispatch cannot
    be automatic: a bare Column carries no dtype, and NTZ->DECIMAL
    fails analysis, so both branches cannot share one expression).
    Callers with a DataFrame in hand: ``dict(df.dtypes)[name]`` is the
    value to pass."""
    from fstd2pandas_spark.functions.timeutil import ntz_epoch_s

    if ts_dtype == "timestamp":
        epoch_s = F.floor(ts.cast("decimal(26,6)")).cast("long")
    else:
        epoch_s = ntz_epoch_s(ts)
    units5 = ((epoch_s - F.lit(_EPOCH_1980)) / 5).cast("long")
    return (
        F.lit(_STAMP_BASE) + (units5 / 8).cast("long") * 10 + (units5 % 8)
    ).cast("long")


def stamp_from_raw(raw: Column) -> Column:
    """Directory word -> stamp (std_io.py:781: ``(raw>>3)*10 + (raw&7)``)."""
    return F.shiftright(raw, 3) * 10 + raw.bitwiseAND(F.lit(7))


def raw_from_stamp(stamp: Column) -> Column:
    """Stamp -> directory word (inverse of :func:`stamp_from_raw`)."""
    return F.shiftleft((stamp / 10).cast("long"), 3) + (stamp % 10)


def forecast_hour_seconds(deet: Column, npas: Column) -> Column:
    """Forecast lead time in seconds = deet * npas (std_dec.py:89-101)."""
    return (deet.cast("long") * npas.cast("long")).alias("forecast_hour_seconds")


def stamp_to_datetime_py(stamp: int) -> "_dt.datetime | None":
    """Python scalar stamp decode (tests / row constructors)."""
    if stamp in _DUMMY_STAMPS:
        return None
    x = stamp - _STAMP_BASE
    units5 = (x // 10) * 8 + (x % 10)
    return _dt.datetime(1980, 1, 1) + _dt.timedelta(seconds=units5 * 5)


def datetime_to_stamp_py(dt: _dt.datetime) -> int:
    """Python scalar stamp encode."""
    units5 = int((dt - _dt.datetime(1980, 1, 1)).total_seconds()) // 5
    return _STAMP_BASE + (units5 // 8) * 10 + (units5 % 8)


# ---------------------------------------------------------------------------
# convertIp
# ---------------------------------------------------------------------------

def decode_ip_kind(ip: Column) -> Column:
    """Level kind from an encoded ip (new + old styles)."""
    return (
        F.when(ip > 32767, F.shiftright(ip, 24).bitwiseAND(F.lit(31)))
        .when(ip < 2000, F.lit(2))
        .when(ip <= 12000, F.lit(1))
        .when(ip <= 32000, F.lit(0))
        .otherwise(F.lit(3))
    )


def decode_ip_value(ip: Column) -> Column:
    """Level value from an encoded ip (new + old styles), as double."""
    exp = F.shiftright(ip, 20).bitwiseAND(F.lit(15))
    mant = ip.bitwiseAND(F.lit(0xFFFFF))
    signed = F.when(mant > 1000000, -(mant - 1000000)).otherwise(mant)
    new_val = signed.cast("double") * F.pow(F.lit(10.0), (F.lit(4) - exp).cast("double"))
    return (
        F.when(ip > 32767, new_val)
        .when(ip < 2000, ip.cast("double"))
        .when(ip <= 12000, (ip - 2000).cast("double") / 10000.0)
        .when(ip <= 32000, ((ip - 12001) * 5).cast("double"))
        .otherwise(ip.cast("double"))
    )


def encode_ip_expr(value: Column, kind: Column) -> Column:
    """New-style convertIp encode as a native expression.

    Mirrors the normalization loop (exp from 4, scale |v| into
    [100000, 999999], round) using log10 plus one fix-up round; exact for
    values whose mantissa does not round across the 10^6 boundary, which
    the fix-up handles.
    """
    v = F.abs(value.cast("double"))

    def _m(e):
        return F.round(v * F.pow(F.lit(10.0), (e - F.lit(4)).cast("double"))).cast("long")

    e0 = F.when(v == 0, F.lit(15)).otherwise(
        F.greatest(F.least(F.lit(9) - F.floor(F.log10(v)).cast("int"), F.lit(15)), F.lit(0))
    ).cast("int")
    m0 = _m(e0)
    # positive fix-up: if rounding pushed mantissa to 10^6, drop one exponent
    e_pos = F.when((m0 >= 1000000) & (e0 > 0), e0 - 1).otherwise(e0)
    m_pos = F.least(F.when(e_pos == e0, m0).otherwise(_m(e_pos)), F.lit(999999))
    # negative branch: mantissa capacity is 48575 (20-bit field minus
    # the 1000000 sign offset) — shed digits only WHILE the mantissa
    # exceeds it (encode_ip_py's loop; two conditional sheds cover
    # m0 <= 10^6 exactly). An unconditional first shed diverged from
    # the Python/reference loop on tiny values (|v| < 1e-6, exponent
    # pinned at 15 with the mantissa ALREADY under 48575): same decoded
    # value, different bit pattern — a bit-parity break between the
    # expression and encode_ip_py (round-15 review; property-pinned).
    e_n1 = F.when((m0 > 48575) & (e0 > 0), e0 - 1).otherwise(e0)
    m_n1 = F.when(e_n1 == e0, m0).otherwise(_m(e_n1))
    e_neg = F.when((m_n1 > 48575) & (e_n1 > 0), e_n1 - 1).otherwise(e_n1)
    m_neg = F.least(F.when(e_neg == e_n1, m_n1).otherwise(_m(e_neg)), F.lit(48575))

    e1 = F.when(value < 0, e_neg).otherwise(e_pos)
    mant = F.when(value < 0, m_neg + 1000000).otherwise(m_pos)
    return (
        F.shiftleft(kind.cast("long").bitwiseAND(F.lit(31)), 24)
        + F.shiftleft(e1.cast("long"), 20)
        + mant
    ).cast("int")


#: alias — the preferred public name
encode_ip = encode_ip_expr


#: printable kind -> kind code (C16; reference utils.py:90-99)
PKIND_TO_KIND = {"m": 0, "sg": 1, "mb": 2, "M": 4, "hy": 5, "th": 6,
                 "H": 10, "mp": 21}


def encode_ip_from_user(value: Column, pkind: Column) -> Column:
    """C16 (reference utils.py:79-108 ``ip_from_value_and_kind``): encode
    an ip from a value and a *printable* kind string (m, sg, mb, M, hy,
    th, H, mp) — the printable alias resolves to its kind code through a
    when() cascade, then the new-style packer runs."""
    kind = F.lit(None).cast("int")
    for pk, k in PKIND_TO_KIND.items():
        kind = F.when(F.trim(pkind) == pk, F.lit(k)).otherwise(kind)
    return encode_ip_expr(value, kind)


def encode_ip_from_user_py(value: float, pkind: str) -> int:
    """Driver-side scalar variant of :func:`encode_ip_from_user`."""
    return encode_ip_py(value, PKIND_TO_KIND[pkind.strip()])


def decode_ip_py(ip: int) -> tuple[float, int]:
    """Python scalar convertIp decode -> (value, kind)."""
    ip = int(ip)
    if ip > 32767:
        kind = (ip >> 24) & 31
        exp = (ip >> 20) & 15
        mant = ip & 0xFFFFF
        if mant > 1000000:
            mant = -(mant - 1000000)
        return mant * 10.0 ** (4 - exp), kind
    if ip < 2000:
        return float(ip), 2
    if ip <= 12000:
        return (ip - 2000) / 10000.0, 1
    if ip <= 32000:
        return float((ip - 12001) * 5), 0
    return float(ip), 3


def encode_ip_py(value: float, kind: int) -> int:
    """Python scalar convertIp new-style encode (the reference loop
    semantics: exp starts at 4, scale into [100000, 1000000), round)."""
    exp = 4
    av = abs(float(value))
    temp = av
    while 0 < exp < 15:
        if temp >= 1000000.0:
            temp /= 10.0
            exp -= 1
        elif temp < 100000.0:
            temp *= 10.0
            exp += 1
        else:
            break
    mant = int(round(temp))
    if value < 0:
        # mantissa capacity for negatives is 48575 (20-bit field minus the
        # 1000000 sign offset) — shed digits until it fits
        while mant > 48575 and exp > 0:
            exp -= 1
            mant = int(round(av * 10.0 ** (exp - 4)))
        mant = min(mant, 48575) + 1000000
    else:
        if mant >= 1000000 and exp > 0:
            exp -= 1
            mant = int(round(av * 10.0 ** (exp - 4)))
        mant = min(mant, 999999)
    return ((int(kind) & 31) << 24) | (exp << 20) | mant
