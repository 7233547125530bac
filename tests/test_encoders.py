"""Encoder round-trip tests (SURVEY §5.2: decode∘encode = id, mirroring
std_enc.py <-> std_dec.py)."""

import pytest
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.encoders import (
    DATYP_PRIORITY,
    InvalidTimezoneError,
    encoded_datyp,
    encoded_etiket,
    encoded_npas_and_ip2,
    encoded_time_interval_ips,
    modifiers_to_typvar2,
    precision_max,
    to_timezone,
)
from fstd2pandas_spark.functions.meta import data_type_str, parsed_etiket
from fstd2pandas_spark.functions.codecs import decode_ip_value, decode_ip_kind


def test_etiket_roundtrip(spark):
    etikets = ["R1_V710_N", "G133K80N", "R1ABCDEFN123", "SPOOKI_STUFF"]
    df = spark.createDataFrame([(e,) for e in etikets], "etiket string")
    out = df.select(
        "etiket", parsed_etiket(F.col("etiket")).alias("p")
    ).select(
        "etiket",
        encoded_etiket(F.col("p.label"), F.col("p.run"),
                       F.col("p.implementation"),
                       F.col("p.ensemble_member")).alias("re"),
    ).collect()
    for r in out:
        assert r.re == r.etiket, (r.etiket, r.re)


def test_datyp_roundtrip(spark):
    from fstd2pandas_spark.schema import DATYP_DICT

    codes = list(DATYP_DICT)
    df = spark.createDataFrame([(c,) for c in codes], "datyp int")
    out = df.select(
        "datyp",
        encoded_datyp(data_type_str(F.col("datyp"))).alias("re"),
    ).collect()
    for r in out:
        # alias collisions (same letter for several codes) resolve to the
        # first code with that letter, like the reference's dict inversion
        from fstd2pandas_spark.schema import DATYP_DICT as D

        first = next(k for k, v in D.items() if v == D[r.datyp])
        assert r.re == first


def test_npas_ip2_encode(spark):
    df = spark.createDataFrame([(21600.0, 300)], "secs double, deet int")
    r = df.select(
        encoded_npas_and_ip2(F.col("secs"), F.col("deet")).alias("x")
    ).select("x.npas", "x.ip2",
             decode_ip_value(F.col("x.ip2")).alias("v"),
             decode_ip_kind(F.col("x.ip2")).alias("k")).first()
    assert r.npas == 72
    assert r.k == 10 and abs(r.v - 6.0) < 1e-6


def test_typvar2_flags(spark):
    rows = [
        # (z, f, i, u, b, e, m) -> expected
        ((False,) * 7, ""),
        ((True, False, False, False, False, False, False), "Z"),
        ((False, False, False, True, False, False, False), "U"),
        ((True, True, False, False, False, False, False), "M"),
        ((False, False, False, False, False, False, True), "M"),
    ]
    df = spark.createDataFrame(
        [tuple(r[0]) for r in rows],
        "z boolean, f boolean, i boolean, u boolean, b boolean, "
        "e boolean, m boolean")
    out = df.select(modifiers_to_typvar2(
        F.col("z"), F.col("f"), F.col("i"), F.col("u"), F.col("b"),
        F.col("e"), F.col("m")).alias("t")).collect()
    assert [r.t for r in out] == [exp for _, exp in rows]


def test_time_interval_ips_roundtrip(spark):
    df = spark.createDataFrame([(12.0, 6.0)], "a double, b double")
    r = df.select(
        encoded_time_interval_ips(F.col("a"), F.col("b")).alias("x")
    ).select(decode_ip_value(F.col("x.ip2")).alias("v2"),
             decode_ip_kind(F.col("x.ip2")).alias("k2"),
             decode_ip_value(F.col("x.ip3")).alias("v3")).first()
    assert abs(r.v2 - 12.0) < 1e-6 and r.k2 == 10
    assert abs(r.v3 - 6.0) < 1e-6


def test_precision_max(spark):
    df = spark.createDataFrame([(134, 16, 5, 32), (1, 12, 2, 8)],
                               "da int, na int, db int, nb int")
    out = df.select(precision_max(
        F.col("da"), F.col("na"), F.col("db"), F.col("nb")).alias("p")
    ).select("p.datyp", "p.nbits").collect()
    # 5 (rank 7) beats 134 (rank 6); 1 (rank 5) beats 2 (rank 1)
    assert (out[0].datyp, out[0].nbits) == (5, 32)
    assert (out[1].datyp, out[1].nbits) == (1, 12)
    assert DATYP_PRIORITY[5] > DATYP_PRIORITY[134]


def test_to_timezone(spark):
    df = spark.createDataFrame([("2020-07-14 12:00:00",)], "t string") \
        .select(F.col("t").cast("timestamp").alias("t"))
    r = df.select(to_timezone(F.col("t"), "America/Montreal").alias("x")).first()
    assert r.x.hour == 8  # UTC-4 in July
    with pytest.raises(InvalidTimezoneError):
        to_timezone(F.col("t"), "Not/AZone")


def test_precision_max_sql_mirror_full_lattice(spark):
    """round-15 mirror lock: precision_max (C22) vs the gate's
    _PM_PRIO_SQL over the FULL datyp lattice (every pair from
    DATYP_PRIORITY plus unknown codes) — not just the 5x5 sample the
    fst_encode_ip gate rotates through."""
    import duckdb

    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from fstd2pandas_spark.functions.encoders import (
        DATYP_PRIORITY, precision_max)

    codes = sorted(DATYP_PRIORITY) + [99, 3]      # 99/3: unknown -> 0
    pairs = [(a, na, b, nb)
             for a in codes for b in codes
             for na, nb in ((8, 16), (32, 12))]
    df = spark.createDataFrame(pairs, "da int, na int, db int, nb int")
    got = {(r["da"], r["na"], r["db"], r["nb"]): (r["p"]["datyp"],
                                                  r["p"]["nbits"])
           for r in df.select(
               "da", "na", "db", "nb",
               precision_max(F.col("da"), F.col("na"),
                             F.col("db"), F.col("nb")).alias("p"))
           .collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(da INT, na INT, db INT, nb INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", pairs)
    pa = E._PM_PRIO_SQL.format(d="da")
    pb = E._PM_PRIO_SQL.format(d="db")
    sql = (f"SELECT da, na, db, nb, "
           f"CASE WHEN ({pa}) >= ({pb}) THEN da ELSE db END AS d, "
           f"greatest(na, nb) AS n FROM t")
    for da, na, db, nb, d, n in con.execute(sql).fetchall():
        assert got[(da, na, db, nb)] == (d, n), (da, db)
