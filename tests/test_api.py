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


def test_compat_surface(spark):
    """Every reference-named compat wrapper runs against the fixture and
    produces the columns the reference version would."""
    import datetime

    import numpy as np

    from fixtures import build_fst_records
    from fstd2pandas_spark import compat as fc

    rec = build_fst_records(spark)

    # full default set ('etiket' AND 'ip_info' both add label/run/... —
    # the reference contract is replace-if-present, so no duplicates)
    df = fc.add_columns(rec)
    for col in ("label", "run", "unit", "description",
                "date_of_observation", "date_of_validity",
                "forecast_hour", "data_type_str", "vctype", "zapped"):
        assert col in df.columns, col
    assert len(df.columns) == len(set(df.columns))
    # idempotent: running the dispatcher again must not widen the frame
    assert len(fc.add_columns(df).columns) == len(df.columns)
    df.limit(2).collect()

    assert "shape" in fc.add_shape_column(rec).columns
    flags = fc.add_flag_values(rec)
    assert "zapped" in flags.columns or "unit_converted" in flags.columns
    ipinfo = fc.add_ip_info_columns(rec)
    for col in ("level", "ip1_kind", "ip1_pkind", "surface"):
        assert col in ipinfo.columns
    assert fc.reorder_columns(rec).columns[0] == "nomvar"
    assert "grid" in fc.add_grid_column(rec).columns

    # scalar helpers
    assert isinstance(fc.convert_rmndate_to_datetime(442998800),
                      datetime.datetime)
    (v1, k1), _, _ = fc.decode_ip123(95178882, 0, 0)
    assert k1 in range(0, 32)
    ip = fc.ip_from_value_and_kind(500.0, "mb")
    assert ip > 32767
    assert fc.get_unit_by_name("celsius")["name"] == "celsius"
    out = fc.unit_convert_array(np.array([0.0, 100.0]), "celsius", "kelvin")
    assert np.allclose(out, [273.15, 373.15])
    assert np.all(fc.unit_convert_array(np.array([1.0]), "celsius",
                                        "scalar") == 1.0)

    # frame-level re-exports
    assert fc.get_meta_fields_exists(rec).count() >= 1
    assert fc.get_lat_lon(rec).count() > 0
    assert fc.compute_stats(rec).count() == rec.count()
    assert fc.create_empty_dataframe(spark, 3).count() == 3
