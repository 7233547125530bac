"""Source/sink tests: fstrec DataSource round-trip + pushdown, CSV dialect."""

import os

import pytest
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import BASE_COLUMNS


@pytest.fixture(scope="module")
def registered(spark):
    from fstd2pandas_spark.sources import register

    register(spark)
    return spark


@pytest.fixture(scope="module")
def fstrec_dir(registered, records, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fstrec"))
    (
        records.repartition(2)
        .write.format("fstrec").mode("overwrite").save(out)
    )
    return out


def test_fstrec_roundtrip(registered, records, fstrec_dir):
    back = registered.read.format("fstrec").load(fstrec_dir)
    assert back.count() == records.count()
    cols = [c for c in BASE_COLUMNS if c != "d"]
    orig = {tuple(r[c] for c in cols) for r in records.collect()}
    got = {tuple(r[c] for c in cols) for r in back.collect()}
    assert orig == got
    # payload fidelity (float32 exact)
    key = ("nomvar", "typvar", "grid", "ip1", "ip2", "datev")
    o = {tuple(r[c] for c in key): r.d for r in records.collect()}
    g = {tuple(r[c] for c in key): r.d for r in back.collect()}
    assert set(o) == set(g)
    for k, d in o.items():
        assert g[k] == pytest.approx(d, rel=1e-6)


def test_fstrec_filter_pushdown_reads_correct_subset(registered, fstrec_dir):
    df = registered.read.format("fstrec").load(fstrec_dir)
    tt = df.filter(F.col("nomvar") == "TT")
    assert tt.count() == 10           # 8 on grid 1 + 2 on grid 3
    assert all(r.nomvar == "TT" for r in tt.collect())
    rng = df.filter((F.col("ip1") >= 2000) & (F.col("ip1") <= 12000))
    assert all(2000 <= r.ip1 <= 12000 for r in rng.collect())


def test_fstrec_metadata_only_scan(registered, fstrec_dir):
    meta = (
        registered.read.format("fstrec").option("with_data", "false")
        .load(fstrec_dir)
    )
    rows = meta.select("nomvar", "d").collect()
    assert all(r.d is None for r in rows)
    assert len(rows) > 0


def test_csv_roundtrip(spark, tmp_path):
    from fstd2pandas_spark.sources import read_csv_records, write_csv_records

    p = tmp_path / "recs.csv"
    p.write_text(
        "# comment line\n"
        "nomvar,level,d\n"
        "TT,1.0,\"1.5,2.5;3.5,4.5\"\n"
        "TT,2.0,\"5.0,6.0;7.0,8.0\"\n"
        "UV,1.0,\"1,2,3;4,5,6\"\n"
    )
    df = read_csv_records(spark, str(p))
    rows = {(r.nomvar, r.ip1): r for r in df.collect()}
    assert len(rows) == 3
    tt = [r for r in rows.values() if r.nomvar == "TT"][0]
    assert (tt.ni, tt.nj, tt.nk) == (2, 2, 1)
    assert tt.etiket == "CSVREADER" and tt.typvar == "X"
    assert tt.datyp == 1 and tt.nbits == 24 and tt.grtyp == "X"
    uv = [r for r in rows.values() if r.nomvar == "UV"][0]
    assert (uv.ni, uv.nj) == (3, 2)
    assert uv.d == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    # level encoded with kind 3
    from fstd2pandas_spark.functions.codecs import decode_ip_py
    v, k = decode_ip_py(tt.ip1)
    assert k == 3 and v == pytest.approx(1.0)

    out = tmp_path / "out_csv"
    write_csv_records(df, str(out))
    back = read_csv_records(spark, str(out) + "/*.csv", encode_ip1=False)
    assert back.count() == 3


def test_csv_validation(spark, tmp_path):
    from fstd2pandas_spark.sources.csv_source import (
        CsvReaderError, read_csv_records,
    )

    p = tmp_path / "bad.csv"
    p.write_text("nomvar,bogus,d\nTT,1,\"1\"\n")
    with pytest.raises(CsvReaderError):
        read_csv_records(spark, str(p))
    p2 = tmp_path / "bad2.csv"
    p2.write_text("nomvar,level,ip1,d\nTT,1.0,500,\"1\"\n")
    with pytest.raises(CsvReaderError):
        read_csv_records(spark, str(p2))


def test_maybe_fstrec(fstrec_dir, tmp_path):
    from fstd2pandas_spark.sources.fstrec_format import maybe_fstrec

    files = [f for f in os.listdir(fstrec_dir) if f.endswith(".fstrec")]
    assert files
    assert maybe_fstrec(os.path.join(fstrec_dir, files[0]))
    other = tmp_path / "not.fstrec"
    other.write_bytes(b"garbage")
    assert not maybe_fstrec(str(other))


def test_writer_modes_and_update(registered, records, tmp_path):
    """S9: write (cleanup+order), dump (raw), update (in-place metadata)."""
    from fstd2pandas_spark.sources import write_record_table, detect_rewrite

    out = str(tmp_path / "w1")
    write_record_table(records, out, mode="write", overwrite=True)
    back = registered.read.format("fstrec").load(out)
    assert back.count() > 0
    # write mode ran metadata_cleanup: no unreferenced meta rows appear
    dumped = str(tmp_path / "w2")
    write_record_table(records, dumped, mode="dump", overwrite=True)
    assert registered.read.format("fstrec").load(dumped).count() == records.count()

    # update: retag every TT record's etiket in-place
    tt = (
        back.filter(F.col("nomvar") == "TT")
        .select("path", "key", F.lit("RETAGGED").alias("etiket"))
    )
    write_record_table(tt, out, mode="update")
    again = registered.read.format("fstrec").load(out)
    tags = {r.etiket for r in again.filter(F.col("nomvar") == "TT")
            .select("etiket").distinct().collect()}
    assert tags == {"RETAGGED"}
    # payloads untouched
    d0 = {r.key: r.d for r in back.filter(F.col("nomvar") == "TT").collect()}
    d1 = {r.key: r.d for r in again.filter(F.col("nomvar") == "TT").collect()}
    assert d0.keys() == d1.keys() and all(d0[k] == d1[k] for k in d0)


def test_detect_rewrite(registered, records):
    from fstd2pandas_spark.sources import detect_rewrite

    uniq = records.dropDuplicates(["nomvar", "typvar", "etiket", "ip1",
                                   "ip2", "ip3"])
    assert not detect_rewrite(uniq)
    assert detect_rewrite(uniq.unionByName(uniq.limit(1)))


def test_write_partition_by_clusters_files(registered, records, tmp_path):
    """§7.2 layout: partition_by clusters one key group per output file."""
    from fstd2pandas_spark.sources.writer import write_record_table
    from fstd2pandas_spark.sources.fstrec_format import (
        list_fstrec_files, read_directory)

    out = str(tmp_path / "clustered")
    write_record_table(records, out, mode="dump", partition_by=["grid"],
                       overwrite=True)
    grids_per_file = []
    for f in list_fstrec_files(out):
        headers = read_directory(f)
        if not headers:
            continue
        grids_per_file.append({(h.ig1, h.ig2) for h in headers})
    assert grids_per_file
    # hash clustering: a grid never splits across files (same-key rows
    # land in one partition; distinct keys may share one)
    seen: dict = {}
    for i, grids in enumerate(grids_per_file):
        for g in grids:
            assert g not in seen, f"grid {g} split across files {seen[g]},{i}"
            seen[g] = i
    assert len(seen) >= 2
