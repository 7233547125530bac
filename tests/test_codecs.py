"""Codec round-trip + anchor tests (reference doctests, SURVEY §5.2/§5.4)."""

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.codecs import (
    datetime_to_stamp_py,
    decode_ip_py,
    encode_ip_py,
    stamp_to_datetime_py,
    stamp_to_timestamp,
    timestamp_to_stamp,
    decode_ip_value,
    decode_ip_kind,
    encode_ip_expr,
)


# --- anchors from reference doctests -------------------------------------

def test_stamp_anchor():
    # std_dec.py:180-182
    assert stamp_to_datetime_py(442998800) == dt.datetime(2020, 7, 14, 12, 0)
    assert stamp_to_datetime_py(0) is None
    assert stamp_to_datetime_py(10101011) is None


def test_stamp_roundtrip_py():
    for d in [dt.datetime(1980, 1, 1), dt.datetime(2020, 7, 14, 12),
              dt.datetime(2026, 8, 13, 6, 30), dt.datetime(1999, 12, 31, 23, 59, 55)]:
        assert stamp_to_datetime_py(datetime_to_stamp_py(d)) == d


def test_ip_anchors():
    # std_dec.py:201-203 — is_surface(5, 0.36116) context
    v, k = decode_ip_py(94733000)
    assert k == 5 and abs(v - 0.36116) < 1e-9
    # well-known hybrid surface ip1
    assert encode_ip_py(1.0, 5) == 93423264
    assert encode_ip_py(0.36116, 5) == 94733000
    # old style
    assert decode_ip_py(500) == (500.0, 2)          # pressure mb
    assert decode_ip_py(11950) == (0.995, 1)        # sigma
    assert decode_ip_py(12001) == (0.0, 0)          # height


@given(
    v=st.floats(min_value=0.0001, max_value=1_000_000, allow_nan=False),
    k=st.sampled_from([0, 1, 2, 4, 5, 10, 21]),
)
@settings(max_examples=300, deadline=None)
def test_ip_roundtrip_py(v, k):
    ip = encode_ip_py(v, k)
    v2, k2 = decode_ip_py(ip)
    assert k2 == k
    assert v2 == pytest.approx(v, rel=5e-6)


# --- Spark expression == python scalar ------------------------------------

def test_spark_exprs_match_python(spark):
    ips = [94733000, 93423264, encode_ip_py(850.0, 2), encode_ip_py(0.3, 1),
           500, 11950, 12001, 2000, 0, 32001, encode_ip_py(-5.0, 0)]
    df = spark.createDataFrame([(ip,) for ip in ips], "ip int")
    out = df.select(
        "ip",
        decode_ip_value(F.col("ip")).alias("v"),
        decode_ip_kind(F.col("ip")).alias("k"),
    ).collect()
    for row in out:
        v, k = decode_ip_py(row.ip)
        assert row.k == k, row.ip
        assert row.v == pytest.approx(v, rel=1e-9), row.ip


def test_spark_encode_matches_python(spark):
    vals = [(0.36116, 5), (1.0, 5), (850.0, 2), (0.995, 1), (10.0, 4),
            (0.0, 4), (1013.25, 2), (-2.5, 0), (99999.5, 0), (123456.0, 0)]
    df = spark.createDataFrame(vals, "v double, k int")
    out = df.select("v", "k", encode_ip_expr(F.col("v"), F.col("k")).alias("ip")).collect()
    for row in out:
        assert row.ip == encode_ip_py(row.v, row.k), (row.v, row.k)


def test_spark_encode_matches_python_property(spark):
    """round-15 codecs.py review, property-pinned: encode_ip_expr is
    BIT-IDENTICAL to encode_ip_py over a randomized magnitude sweep
    covering both signs and the exponent-saturated tail. The old
    negative branch shed a mantissa digit UNCONDITIONALLY, so a tiny
    negative value (|v| < 1e-6, exponent pinned at 15 with the
    mantissa already under the 48575 capacity) encoded at a different
    exponent than the Python/reference loop — same decoded value,
    different bit pattern."""
    import random

    rng = random.Random(20260816)
    vals = []
    for _ in range(300):
        mag = 10.0 ** rng.uniform(-9, 7)
        sign = rng.choice([1.0, -1.0])
        vals.append((sign * mag, rng.choice([0, 1, 2, 4, 5, 6, 10, 21])))
    # the exact divergence shape, deterministically
    vals += [(-1e-7, 0), (-9.9e-7, 1), (-1e-9, 5), (1e-7, 0),
             (-48575.0, 0), (-48576.0, 0), (-999999.4, 0)]
    df = spark.createDataFrame(vals, "v double, k int")
    out = df.select(
        "v", "k", encode_ip_expr(F.col("v"), F.col("k")).alias("ip")
    ).collect()
    for row in out:
        assert row.ip == encode_ip_py(row.v, row.k), (row.v, row.k)


def test_spark_stamp_roundtrip(spark):
    stamps = [442998800, datetime_to_stamp_py(dt.datetime(1980, 1, 2)),
              datetime_to_stamp_py(dt.datetime(2026, 8, 13, 6))]
    df = spark.createDataFrame([(s,) for s in stamps], "stamp long")
    out = df.select(
        "stamp",
        stamp_to_timestamp(F.col("stamp")).alias("ts"),
        timestamp_to_stamp(stamp_to_timestamp(F.col("stamp"))).alias("back"),
    ).collect()
    for row in out:
        assert row.back == row.stamp
        assert row.ts.replace(tzinfo=None) == stamp_to_datetime_py(row.stamp)


def test_timestamp_to_stamp_ltz_dispatch(spark):
    """An LTZ TimestampType input (e.g. the streaming plane's
    watermark-cast event_time) must encode the INSTANT's UTC wall, not
    the session-zone rendering: ts_dtype="timestamp" routes through
    the TZ-free decimal-cast epoch. Verified under a non-UTC session —
    the exact configuration where the implicit LTZ->NTZ default path
    would shift every stamp by the UTC offset."""
    utc_wall = dt.datetime(2020, 7, 14, 16, 0)   # NY 12:00 EDT instant
    want = datetime_to_stamp_py(utc_wall)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql(
            "SELECT timestamp'2020-07-14 12:00:00' AS event_time")
        assert dict(df.dtypes)["event_time"] == "timestamp"
        got = df.select(
            timestamp_to_stamp(F.col("event_time"),
                               ts_dtype="timestamp").alias("s")
        ).collect()[0].s
        assert got == want
        # and the default NTZ path stays wall-field-exact under the
        # same non-UTC session (the round-17 contract)
        df2 = spark.sql(
            "SELECT timestamp_ntz'2020-07-14 16:00:00' AS wall")
        got2 = df2.select(
            timestamp_to_stamp(F.col("wall")).alias("s")).collect()[0].s
        assert got2 == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_encode_ip_from_user(spark):
    """C16: printable-kind encode matches int-kind encode and round-trips."""
    from pyspark.sql import functions as F
    from fstd2pandas_spark.functions.codecs import (
        encode_ip_from_user, encode_ip_from_user_py, encode_ip_py,
        decode_ip_py,
    )

    cases = [(850.0, "mb", 2), (0.995, "sg", 1), (1.0, "hy", 5),
             (10.0, "m", 0), (24.0, "H", 10), (0.5, "th", 6)]
    df = spark.createDataFrame([(v, pk) for v, pk, _ in cases],
                               ["value", "pkind"])
    out = df.withColumn("ip", encode_ip_from_user(F.col("value"),
                                                  F.col("pkind"))).collect()
    for (v, pk, k), row in zip(cases, out):
        assert row.ip == encode_ip_py(v, k) == encode_ip_from_user_py(v, pk)
        dv, dk = decode_ip_py(row.ip)
        assert dk == k
        assert abs(dv - v) < 1e-4 * max(1.0, abs(v))


def test_turbo_codec_roundtrips():
    """Turbo-pack (datyps 130/134, turbo_codec.py; reference
    std_io.py:550-560 armn_compress + c_float_packer routing): quantize ->
    Lorenzo residuals -> zigzag -> block bit-pack round-trips through
    itself — random float grids, multi-block sizes, and all-zero edges."""
    import numpy as np

    from fstd2pandas_spark.sources.turbo_codec import (
        compress_payload, decompress_payload)

    rng = np.random.RandomState(11)
    for ni, nj in [(1, 1), (7, 5), (33, 1), (64, 48)]:
        n = ni * nj
        # datyp 134: lossy float quantization, error <= half quantum
        for nbits in (12, 16, 24):
            d = (rng.randn(n) * 100).astype("<f4")
            words = compress_payload(d, ni, nj, 1, 134, nbits)
            back = decompress_payload(words, ni, nj, 1, 134, nbits)
            span = float(d.max() - d.min()) or 1.0
            assert back.dtype == np.dtype("<f4")
            assert np.allclose(back, d, atol=span / (1 << (nbits - 1)))
        # datyp 134 exact case: integer-valued floats within nbits quanta
        ints = rng.randint(0, 1 << 10, size=n).astype("<f4")
        w = compress_payload(ints, ni, nj, 1, 134, 16)
        assert np.array_equal(decompress_payload(w, ni, nj, 1, 134, 16), ints)
        # datyp 130: unsigned-short tokens, bit-exact
        u = rng.randint(0, 1 << 12, size=n).astype("u2")
        w = compress_payload(u, ni, nj, 1, 130, 16)
        assert np.array_equal(
            decompress_payload(w, ni, nj, 1, 130, 16), u.astype("<f4"))
    # all-zero input (both codes) and constant input
    for datyp in (130, 134):
        z = np.zeros(40, dtype="<f4")
        w = compress_payload(z, 8, 5, 1, datyp, 16)
        assert np.array_equal(decompress_payload(w, 8, 5, 1, datyp, 16), z)
    c = np.full(40, 7.0, dtype="<f4")
    w = compress_payload(c, 8, 5, 1, 134, 16)
    assert np.array_equal(decompress_payload(w, 8, 5, 1, 134, 16), c)


def test_codec_family_roundtrips():
    """Datyps 1/6 (legacy packed floats), 129 (compressed quantized),
    132 (compressed signed int), 133 (compressed IEEE bit-exact)."""
    import numpy as np

    from fstd2pandas_spark.sources.turbo_codec import (
        compress_payload, decompress_payload)

    rng = np.random.RandomState(17)
    ni, nj = 9, 7
    n = ni * nj
    f = (rng.randn(n) * 30).astype("<f4")
    for datyp in (1, 6, 129):
        w = compress_payload(f, ni, nj, 1, datyp, 20)
        back = decompress_payload(w, ni, nj, 1, datyp, 20)
        span = float(f.max() - f.min())
        assert np.allclose(back, f, atol=span / (1 << 19))
    s = rng.randint(-2000, 2000, size=n).astype("i2")
    w = compress_payload(s, ni, nj, 1, 132, 16)
    assert np.array_equal(decompress_payload(w, ni, nj, 1, 132, 16),
                          s.astype("<f4"))
    # 133: IEEE bit patterns survive exactly, including -0.0 and tiny values
    f2 = np.concatenate([f, np.array([-0.0, 1e-38, -1e-30], dtype="<f4")])
    w = compress_payload(f2, 1, len(f2), 1, 133, 32)
    back = decompress_payload(w, 1, len(f2), 1, 133, 32)
    assert np.array_equal(back.view("<u4"), f2.view("<u4"))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=8, max_value=24),
    st.sampled_from([1, 6, 129, 134]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_turbo_quantized_roundtrip_property(ni, nj, nbits, datyp, seed):
    """Property: every quantized-float codec round-trips any float grid
    within half a quantum of the value span, for any shape (including
    single-row, single-column, and multi-block) and any nbits."""
    import numpy as np

    from fstd2pandas_spark.sources.turbo_codec import (
        compress_payload, decompress_payload)

    rng = np.random.RandomState(seed % 2**31)
    d = (rng.randn(ni * nj) * rng.choice([0.01, 1.0, 1e4])).astype("<f4")
    words = compress_payload(d, ni, nj, 1, datyp, nbits)
    back = decompress_payload(words, ni, nj, 1, datyp, nbits)
    span = float(d.max() - d.min()) or 1.0
    assert back.shape == d.shape
    assert np.allclose(back, d, atol=span / (1 << (nbits - 1)))


def test_decode_sql_mirrors_match_spark_exprs(spark):
    """round-15 gate-integrity lock: every oracle gate leans on the
    DuckDB SQL mirrors of decode_ip_kind / decode_ip_value
    (__spark_entry__._DECODE_KIND_SQL/_DECODE_VALUE_SQL) being
    EQUIVALENT to the Spark Column expressions — sweep ~6k random ips
    across every encoding range (new-style all kinds/exponents,
    negative-mantissa encodings, old-style pressure/sigma/height/
    arbitrary, the range boundaries, and a negative ip) and compare
    bit-exactly. A mirror drift would silently green-light a wrong
    engine change (both sides wrong together is the one failure the
    driver's hash cannot see)."""
    import random

    import duckdb

    import __spark_entry__ as E

    rng = random.Random(20260815)
    ips = [rng.randrange(0, 1 << 28) for _ in range(3000)]
    ips += [rng.randrange(0, 32768) for _ in range(1000)]
    ips += [((rng.randrange(32) << 24) | (rng.randrange(16) << 20)
             | rng.randrange(1000001, 1048576)) for _ in range(1000)]
    ips += [0, 1999, 2000, 12000, 12001, 32000, 32001, 32767, 32768,
            -5, 1048575, 1000000]
    df = spark.createDataFrame([(ip,) for ip in ips], "ip int")
    got = {r["ip"]: (r["k"], r["v"]) for r in df.select(
        "ip", decode_ip_kind(F.col("ip")).alias("k"),
        decode_ip_value(F.col("ip")).alias("v")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(ip INTEGER)")
    con.executemany("INSERT INTO t VALUES (?)", [(ip,) for ip in ips])
    sql = (f"SELECT ip, ({E._DECODE_KIND_SQL.format(ip='ip')}) AS k, "
           f"({E._DECODE_VALUE_SQL.format(ip='ip')}) AS v FROM t")
    for ip, k, v in con.execute(sql).fetchall():
        gk, gv = got[ip]
        assert gk == k, ip
        # NOT bit-exact by design: the sweep itself found that JVM
        # Math.pow(10, -9) and DuckDB's libm pow differ in the last
        # ulp, so mant * 10^(4-exp) can differ by ~1e-16 relative
        # (e.g. ip 83517274: ...001e-06 vs ...999e-06). Every gate
        # rounds decoded values to 4-6 dp, where a 1-ulp wobble only
        # matters on exact .5-at-the-last-digit boundaries (measure
        # zero for decoded grids); 1e-14 still catches any REAL rule
        # drift, which changes values by whole quanta.
        if v == 0:
            assert gv == 0, ip
        else:
            assert abs(gv - v) <= 1e-14 * abs(v), (ip, gv, v)


def test_stamp_and_kindstr_sql_mirrors_match_spark(spark):
    """round-15 gate-integrity lock, part 2: the stamp and kind-string
    SQL mirrors. Random new-style stamps (valid last digit), old-format
    AAMMJJHH stamps (valid and unparseable), dummy/negative stamps, and
    every kind code -1..101 — Spark expression vs DuckDB fragment."""
    import random

    import duckdb

    import __spark_entry__ as E
    from fstd2pandas_spark.functions.meta import kind_str

    rng = random.Random(20260817)
    # new-style: base + positive linear part, last digit 0-7
    news = [123200000 + (v - v % 10 + v % 8)
            for v in (rng.randrange(0, 400_000_000) for _ in range(800))]
    # old-format AAMMJJHH: mix of valid and garbage digit fields
    olds = [aa * 1000000 + mm * 10000 + dd * 100 + hh
            for aa, mm, dd, hh in ((rng.randrange(0, 123),
                                    rng.randrange(0, 20),
                                    rng.randrange(0, 40),
                                    rng.randrange(0, 30))
                                   for _ in range(800))
            if aa * 1000000 + mm * 10000 + dd * 100 + hh < 123200000]
    stamps = news + olds + [0, 10101011, -4, 123200000, 442998800]
    df = spark.createDataFrame([(s,) for s in stamps], "s long")
    got = {r["s"]: r["ts"] for r in df.select(
        "s", stamp_to_timestamp(F.col("s")).alias("ts")).collect()}

    con = duckdb.connect()
    con.execute("SET timezone = 'UTC'")
    con.execute("CREATE TABLE t(s BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in stamps])
    new_arm = E._STAMP_TS_SQL.format(s="s")
    old_arm = E._STAMP_OLD_SQL.format(s="s")
    sql = (f"SELECT s, CASE WHEN s >= 123200000 THEN ({new_arm}) "
           f"ELSE ({old_arm}) END AS ts FROM t")
    for s, ts in con.execute(sql).fetchall():
        g = got[s]
        g = g.replace(tzinfo=None) if g is not None else None
        ts = ts.replace(tzinfo=None) if ts is not None else None
        assert g == ts, (s, g, ts)

    kinds = list(range(-1, 40)) + [100, 101]
    kdf = spark.createDataFrame([(k,) for k in kinds], "k int")
    kgot = {r["k"]: r["ks"] for r in kdf.select(
        "k", kind_str(F.col("k")).alias("ks")).collect()}
    con.execute("CREATE TABLE kt(k INTEGER)")
    con.executemany("INSERT INTO kt VALUES (?)", [(k,) for k in kinds])
    ksql = f"SELECT k, ({E._KIND_STR_SQL.format(k='k')}) AS ks FROM kt"
    for k, ks in con.execute(ksql).fetchall():
        assert kgot[k] == ks, k


def test_parsed_etiket_matches_reference_re(spark):
    """round-15: parsed_etiket (Java rlike cascade) swept against a
    literal transcription of the reference's re.match cascade
    (std_dec.py:268-323) over random 6-bit-alphabet etikets of every
    length 0..12 plus lowercase/near-miss shapes — label/run/
    implementation/ensemble_member must agree exactly, including which
    of the four patterns wins and the whole-etiket fallback."""
    import random
    import re

    from fstd2pandas_spark.functions.meta import parsed_etiket

    def ref(raw):
        mr = "[RGPEAIMWNC_][\\dRLHMEA_]"
        pats = [(mr + "\\w{5}[NPX]$", 5, False),
                (mr + "\\w{5}[NPX]\\w{3}$", 5, True),
                (mr + "\\w{6}[NPX]$", 6, False),
                (mr + "\\w{6}[NPX]\\w{3}$", 6, True)]
        for pat, n, ens in pats:
            if re.match(pat, raw):
                lab = raw[2:2 + n]
                impl = raw[2 + n]
                mem = raw[3 + n:6 + n] if ens else None
                return (lab, raw[:2], impl, mem)
        return (raw, None, None, None)

    rng = random.Random(20260818)
    alpha = [chr(c) for c in range(33, 96)]
    ets = ["".join(rng.choice(alpha) for _ in range(rng.randrange(0, 13)))
           for _ in range(1500)]
    # targeted shapes: valid CMC/SPOOKI with/without member, lowercase
    # label chars (\w matches them; the 6-bit alphabet never ships
    # them, but the ENGINES must still agree), near-misses
    ets += ["R1_V710_N", "R1_V710_NABC", "G2LABEL6X", "G2LABEL6X123",
            "R1_v710_N", "r1_V710_N", "R1_V710_Q", "R1_V710_NAB",
            "R1_V710_NABCD", "", "N", "R1", "R1_V710_N "]
    df = spark.createDataFrame([(e,) for e in ets], "etiket string")
    out = df.select("etiket", parsed_etiket(F.col("etiket")).alias("p")) \
            .collect()
    seen_parsed = 0
    for r in out:
        exp = ref(r["etiket"])
        got = (r["p"]["label"], r["p"]["run"],
               r["p"]["implementation"], r["p"]["ensemble_member"])
        assert got == exp, (r["etiket"], got, exp)
        if exp[1] is not None:
            seen_parsed += 1
    assert seen_parsed >= 4      # the targeted valid shapes all parsed


# --------------------------------------------------------------- round 17
# functions/timeutil.py unit coverage: the TZ cross-section pins the
# helpers end-to-end through the gates; these pin their EDGE semantics
# directly — session-TZ invariance across a DST-observing zone, the
# DST-gap wall time that does not exist locally, microsecond
# exactness, NULL propagation, pre-1970 walls, and the dtype dispatch.


def test_timeutil_epochs_and_truncs_are_session_tz_invariant(spark):
    from fstd2pandas_spark.functions.timeutil import (
        ntz_epoch_s, ntz_epoch_us, ntz_trunc, wall_epoch_us)

    df = spark.sql("""SELECT * FROM VALUES
      (TIMESTAMP_NTZ'2024-03-10 02:30:45.123456'),  -- inside the NY DST gap
      (TIMESTAMP_NTZ'1969-12-31 23:59:59.000001'),  -- pre-1970
      (TIMESTAMP_NTZ'2024-01-01 00:00:00'),
      (CAST(NULL AS TIMESTAMP_NTZ)) AS t(ts)""")
    expect_us = [1710037845123456, -999999, 1704067200000000, None]
    expect_s = [1710037845, -1, 1704067200, None]
    expect_hr = ["2024-03-10 02:00:00", "1969-12-31 23:00:00",
                 "2024-01-01 00:00:00", None]
    expect_wk = ["2024-03-04 00:00:00", "1969-12-29 00:00:00",
                 "2024-01-01 00:00:00", None]
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            rows = df.select(
                ntz_epoch_us("ts").alias("us"),
                ntz_epoch_s("ts").alias("s"),
                ntz_trunc("hour", F.col("ts")).alias("hr"),
                ntz_trunc("week", F.col("ts")).alias("wk"),
            ).collect()
            assert [r.us for r in rows] == expect_us, tz
            assert [r.s for r in rows] == expect_s, tz
            assert [str(r.hr) if r.hr else None
                    for r in rows] == expect_hr, tz
            assert [str(r.wk) if r.wk else None
                    for r in rows] == expect_wk, tz

        # dtype dispatch: numeric = epoch seconds; LTZ = instant epoch
        # (both TZ-free); NTZ = wall fields
        d2 = spark.sql("""SELECT CAST(1704069000 AS BIGINT) AS b,
                                 CAST(1704069000.5 AS DOUBLE) AS d,
                                 timestamp_micros(1704069000123456) AS l,
                                 TIMESTAMP_NTZ'2024-01-01 00:30:00' AS n""")
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            r = d2.select(
                wall_epoch_us(d2, "b").alias("b"),
                wall_epoch_us(d2, "d").alias("d"),
                wall_epoch_us(d2, "l").alias("l"),
                wall_epoch_us(d2, "n").alias("n")).collect()[0]
            assert r.b == 1704069000000000, tz
            assert r.d == 1704069000500000, tz
            assert r.l == 1704069000123456, tz
            assert r.n == 1704069000000000, tz   # 2024-01-01 00:30 UTC
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_timeutil_trunc_rejects_unknown_unit():
    from fstd2pandas_spark.functions.timeutil import ntz_trunc

    with pytest.raises(ValueError, match="unit"):
        ntz_trunc("month", F.lit("2024-01-01"))
