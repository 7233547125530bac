"""Facade parity tests: StandardFileReader/Writer/QuickPressure
(reference std_reader.py:20-113, std_writer.py:30-83) drive the engine
the way a reference user would."""

import pytest
from pyspark.sql import functions as F


def test_reader_writer_roundtrip(spark, records, tmp_path):
    import fstd2pandas_spark as fst

    out = str(tmp_path / "facade")
    fst.StandardFileWriter(out, records, mode="dump").to_fst()

    rdr = fst.StandardFileReader(out, spark=spark)
    df = rdr.to_spark()
    assert df.count() == records.count()

    # metadata query pushes to the source (base-column predicate)
    tt = fst.StandardFileReader(out, query="nomvar == 'TT'",
                                spark=spark).to_spark()
    assert tt.count() > 0
    assert all(r.nomvar == "TT" for r in tt.collect())

    # pandas terminal, reference style
    pdf = fst.StandardFileReader(out, query="ip2 == 0",
                                 spark=spark).to_pandas()
    assert len(pdf) > 0 and (pdf["ip2"] == 0).all()


def test_reader_decoded_query(spark, records, tmp_path):
    """A predicate over DECODED columns analyzes after decode."""
    import fstd2pandas_spark as fst

    out = str(tmp_path / "facade2")
    fst.StandardFileWriter(out, records, mode="dump").to_fst()
    df = fst.StandardFileReader(
        out, decode_metadata=True,
        query="unit == 'celsius' and forecast_hour >= 0",
        spark=spark).to_spark()
    rows = df.collect()
    assert rows and all(r.unit == "celsius" for r in rows)


def test_metadata_only_scan_and_lazy_exports(spark, records, tmp_path):
    import fstd2pandas_spark as fst

    out = str(tmp_path / "facade3")
    fst.StandardFileWriter(out, records, mode="dump").to_fst()
    meta = fst.StandardFileReader(out, with_data=False,
                                  spark=spark).to_spark()
    assert all(r.d is None for r in meta.select("d").collect())

    # reference-named top-level helpers resolve lazily
    stats = fst.fststat(records)
    assert {"min", "max", "mean", "std"} <= set(stats.columns)
    sel = fst.select_with_meta(records, "TT")
    assert sel.filter(F.col("nomvar") == "TT").count() > 0
    with pytest.raises(AttributeError):
        fst.not_a_reference_helper


def test_quick_pressure_shim(spark, records):
    import fstd2pandas_spark as fst

    out = fst.QuickPressure(records).compute()
    assert "nomvar" in out.columns
