"""Full reference-name coverage of the compat layer: every public
function name of the reference package must exist in
fstd2pandas_spark.compat (delegating to this engine), plus behavior
spot-checks for the completion-sweep families."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

import fstd2pandas_spark.compat as C

#: every public def/class-adjacent function name the reference exports
#: (grep '^def ' over the reference package, round-7 snapshot)
REFERENCE_PUBLIC_NAMES = """
add_columns add_dask_column add_data_type_str_column
add_decoded_date_column add_flag_values add_forecast_hour_column
add_grid_column add_ip_info_columns add_metadata_to_query_results
add_parsed_etiket_columns add_path_and_key_columns add_shape_column
add_timezone_column add_unit_and_description_columns close_fst
column_descriptions compute compute_stats convert_date_to_timezone
convert_rmndate_to_datetime convert_to_cmc_xarray
create_empty_dataframe create_encoded_dateo create_encoded_datyp
create_encoded_etiket create_encoded_ip1 create_encoded_ip2
create_encoded_ips create_encoded_npas_and_ip2 decode_ip123
delete_file drop_duplicates encode_ip2_and_ip3_as_time_interval
fstpy_log_level_catast fstpy_log_level_debug fstpy_log_level_error
fstpy_log_level_fatal fstpy_log_level_info fstpy_log_level_warning
fststat get_2d_lat_lon_arr get_2d_lat_lon_df
get_all_grid_metadata_fields_from_std_file get_basic_dataframe
get_column_value_from_row get_constant_by_name
get_constant_row_by_name get_converter get_data get_data_type_str
get_dataframe_from_file get_date_of_validity_data_array
get_df_from_grid get_df_from_vgrid get_field_dtype get_file_list
get_file_modification_time get_forecast_hour
get_grid_definition_params get_grid_deformation_fields
get_grid_identifier get_grid_metadata_fields get_hy_field
get_hybrid_ips get_interval get_ip_info get_ips get_kinds_and_ip1
get_lat_lon get_latitude_data_array get_level_data_array
get_level_sort_order get_longitude_data_array get_meta_fields_exists
get_model_ips get_num_rows_for_reading get_p0_fields
get_parsed_etiket get_path_and_key_from_array get_pressure_ips
get_pt_fields get_sigma_ips get_specific_meta_field get_subgrids
get_temperature_converter get_toctoc_fields get_unit_and_description
get_unit_by_name get_variable_data_array get_vertical_coord
identical_destination_and_record_path initializer
ip_from_value_and_kind is_global_grid is_surface kind_to_string
level_type_follows_topography maybeFST meta_exists metadata_cleanup
modifiers_to_typvar2 open_fst parallel_get_dataframe_from_file
parse_typvar process_hy remove_keys reorder_columns select_meta
select_with_meta set_attrib set_data_array_attributes set_rewrite
set_vertical_coordinate_type setup_fstpy_logger to_cmc_xarray
to_dask to_numpy unit_convert unit_convert_array vectorize
vertical_coord_to_dict voir write_dataframe_record_to_file
""".split()


def test_every_reference_name_exists():
    missing = [n for n in REFERENCE_PUBLIC_NAMES if not hasattr(C, n)]
    assert not missing, f"compat is missing reference names: {missing}"


def test_scalar_decode_helpers(spark):
    assert C.get_data_type_str(5) == "E"
    assert isinstance(C.get_field_dtype(5, 32), np.dtype)
    assert C.get_forecast_hour(3600, 6) == dt.timedelta(hours=6)
    # is_surface / topography / sort order evaluate the engine's own
    # Column rules over one row
    assert C.is_surface(5, 1.0) is True
    assert C.is_surface(2, 500.0) is False
    assert C.level_type_follows_topography(5) is True
    assert C.level_type_follows_topography(2) is False
    assert C.get_level_sort_order(4) is True   # meters: ascending
    assert C.get_level_sort_order(2) is False  # pressure: descending
    label, run, impl, member = C.get_parsed_etiket("R1_V710_N")
    assert isinstance(label, str)
    flags = C.parse_typvar("PZ")
    assert len(flags) == 8 and flags[1] is True  # Z = zapped


def test_scalar_encode_helpers(spark):
    ip1 = C.create_encoded_ip1(0.5, 1)
    dec = C.decode_ip123("TT", ip1, 0, 0)
    assert abs(dec[0]["v1"] - 0.5) < 1e-6 if isinstance(dec[0], dict) \
        else True  # decode shape is engine-defined; encoding must round-trip
    npas, ip2 = C.create_encoded_npas_and_ip2(dt.timedelta(hours=6), 3600)
    assert (npas, ip2) == (6, 6)
    assert C.create_encoded_datyp("E") == 5
    with pytest.raises(ValueError):
        C.create_encoded_datyp("nope")
    t2 = C.modifiers_to_typvar2(zapped=True)
    assert t2 == "Z"


def test_ips_families_and_pickers(spark):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from fixtures import build_fst_records

    df = build_fst_records(spark)
    kinds = C.get_kinds_and_ip1(df)
    assert isinstance(kinds, dict) and kinds
    hyb = C.get_hybrid_ips(df)
    assert hyb == kinds.get(5, [])
    assert set(C.get_model_ips(df)) == set(kinds.get(1, [])
                                           + kinds.get(5, []))
    no_meta = df.filter(~F.col("nomvar").isin(
        ">>", "^^", "^>", "!!", "HY", "P0", "PT", "LA", "LO", "E1"))
    toctoc = C.get_toctoc_fields(df, no_meta, hyb, [], [])
    assert {r.nomvar for r in toctoc.select("nomvar").distinct()
            .collect()} <= {"!!"}
    deform = C.get_grid_deformation_fields(df, no_meta)
    assert {r.nomvar for r in deform.select("nomvar").distinct()
            .collect()} <= {">>", "^^", "^>"}
    meta = C.get_grid_metadata_fields(df)
    assert meta.filter(~F.col("nomvar").isin(
        ">>", "^^", "^>", "LA", "LO", "P0", "PT",
        "HY", "!!", "E1", "!!SF")).count() == 0


def test_misc_helpers(tmp_path):
    assert C.remove_keys({"a": 1, "b": 2}, ["a"]) == {"b": 2}
    assert C.get_num_rows_for_reading(None) == 128
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    assert C.get_file_list(str(tmp_path / "*.bin")) == [str(p)]
    assert C.maybeFST(str(p)) is False
    assert C.identical_destination_and_record_path(str(p), str(p))
    C.delete_file(str(p))
    assert not p.exists()
    with pytest.raises(NotImplementedError):
        C.open_fst("x", "r", "T")
    with pytest.raises(NotImplementedError):
        C.to_dask(np.zeros(3))
    assert C.to_numpy([1, 2]).tolist() == [1, 2]
    desc = C.column_descriptions()
    assert "nomvar" in desc and "d" in desc

    class T:
        @C.initializer
        def __init__(self, a, b=5):
            pass

    t = T(3)
    assert (t.a, t.b) == (3, 5)


def test_unit_and_constant_lookups(spark):
    u, d = C.get_unit_and_description("TT")
    assert u and d
    conv = C.get_converter("celsius", "kelvin")
    out = conv(np.array([0.0, 100.0]))
    np.testing.assert_allclose(out, [273.15, 373.15])


def test_subgrids_roundtrip():
    ax = np.array([2, 3, 2, 3, 2,          # nsub, ni1, nj1, ni2, nj2
                   10., 20., 30., 45., 50.,   # ax1(3), ay1(2)
                   60., 70., 80., -45., -50.])  # ax2(3), ay2(2)
    subs = C.get_subgrids({"grtyp": "U", "ax": ax})
    assert len(subs) == 2
    assert subs[0]["ni"] == 3 and subs[0]["nj"] == 2
    np.testing.assert_allclose(subs[0]["ax"], [10., 20., 30.])
    np.testing.assert_allclose(subs[1]["ay"], [-45., -50.])
    with pytest.raises(ValueError):
        C.get_subgrids({"grtyp": "Z", "ax": ax})


def test_is_global_grid_scalar():
    lon = np.arange(0.0, 360.0, 10.0)          # span+dlon == 360
    ok, rep = C.is_global_grid({"grtyp": "L"}, lon)
    assert ok is True and rep is False
    lon_rep = np.arange(0.0, 361.0, 10.0)      # repeated meridian
    ok, rep = C.is_global_grid({"grtyp": "L"}, lon_rep)
    assert ok is True and rep is True
    assert C.is_global_grid({"grtyp": "A"}, lon) == (True, False)
    assert C.is_global_grid({"grtyp": "B"}, lon) == (True, True)
    # round-15: Z follows the reference's first==last rule
    # (std_grid.py:240-244), not span==360
    z_rep = np.array([0.0, 120.0, 240.0, 0.0])     # repeated meridian
    assert C.is_global_grid({"grtyp": "Z"}, z_rep) == (True, True)
    z_360 = np.arange(0.0, 361.0, 10.0)            # [0..360]: 0 != 360
    assert C.is_global_grid({"grtyp": "Z"}, z_360) == (False, False)
    # non-exact dlon (fmod(360, 7) != 0), reference cases 2 and 3:
    # case 3 — wraps, last point strictly below 360 -> global
    l_c3 = np.arange(0.0, 360.0, 7.0)              # ni*dlon = 364
    assert C.is_global_grid(
        {"grtyp": "L", "ni": l_c3.size, "dlon": 7.0}, l_c3) == (True, False)
    # case 2 — wraps AND the final point re-enters past 360 (stored
    # modulo) at a DIFFERENT longitude -> repetition only, not global
    l_c2 = np.append(l_c3, 4.0)                    # ni*dlon = 371
    assert C.is_global_grid(
        {"grtyp": "L", "ni": l_c2.size, "dlon": 7.0}, l_c2) == (False, True)


def test_file_roundtrip_helpers(spark, tmp_path):
    """write_dataframe_record_to_file -> maybeFST / get_basic_dataframe /
    get_dataframe_from_file / get_data / compute round-trip."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from fixtures import build_fst_records

    df = build_fst_records(spark)
    target = str(tmp_path / "out.fst")
    C.write_dataframe_record_to_file(target, df, mode="dump")
    assert C.maybeFST(target) is True
    back = C.get_basic_dataframe(target, spark=spark)
    assert back.count() == df.count()
    q = C.get_dataframe_from_file(target, query="nomvar == 'TT'",
                                  spark=spark)
    assert q.count() > 0
    assert {r.nomvar for r in q.select("nomvar").distinct()
            .collect()} == {"TT"}
    # point read by (path, key)
    row = back.select("key", "ni", "nj", "nk").first()
    payload = C.get_data(target, row.key)
    assert payload.size == row.ni * row.nj * row.nk
    # driver-side materialization drops path/key
    pdf = C.compute(back.limit(5))
    assert "path" not in pdf.columns and len(pdf) == 5
    assert C.get_file_modification_time(target) is not None


def test_grid_and_vgrid_helpers(spark):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from fixtures import build_fst_records

    df = build_fst_records(spark)
    # one-grid frame -> definition params dict
    one = df.filter(F.col("nomvar") == ">>").limit(1)
    params = C.get_grid_definition_params(one)
    assert set(params) >= {"grtyp", "ni", "nj", "ig1"}
    # lat/lon arrays for an axis-record grid built from scratch
    import numpy as np
    g = dict(grtyp="Z", grref="L", ni=3, nj=2, ig1=77, ig2=88,
             ig1ref=0, ig2ref=0, ig3ref=0, ig4ref=0,
             ax=np.array([10.0, 20.0, 30.0]), ay=np.array([40.0, 50.0]))
    (lat, lon), = C.get_2d_lat_lon_arr(g, spark=spark)
    assert lat.shape == (2, 3) and lon.shape == (2, 3)
    np.testing.assert_allclose(lon[0], [10.0, 20.0, 30.0])
    np.testing.assert_allclose(lat[:, 0], [40.0, 50.0])
    # vgrid descriptor -> one-row '!!'
    tt = C.get_df_from_vgrid(
        {"kind": 5, "version": 2,
         "vtbl": [[93423264.0, 0.25, 100.0], [94423264.0, 0.5, 50.0]]},
        ip1=11, ip2=22, spark=spark)
    r = tt.first()
    assert r.nomvar == "!!" and r.ig1 == 5002
    # vctype classification of the data rows
    vt = C.get_vertical_coord(df, C.select_meta(df),
                              df.filter(F.col("nomvar") == "TT"))
    assert vt  # a vctype string or list of them


def test_meta_picker_wrappers(spark):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from fixtures import build_fst_records

    df = build_fst_records(spark)
    no_meta = df.filter(~F.col("nomvar").isin(
        ">>", "^^", "^>", "!!", "HY", "P0", "PT", "LA", "LO"))
    hyb = C.get_hybrid_ips(df)
    hy = C.get_hy_field(df, hyb)
    assert {r.nomvar for r in hy.select("nomvar").distinct()
            .collect()} <= {"HY"}
    assert C.get_hy_field(df, []).count() == 0  # explicit empty list
    p0 = C.get_p0_fields(df, no_meta, hyb, C.get_sigma_ips(df))
    assert {r.nomvar for r in p0.select("nomvar").distinct()
            .collect()} <= {"P0"}
    pt = C.get_pt_fields(df, no_meta, C.get_sigma_ips(df))
    assert {r.nomvar for r in pt.select("nomvar").distinct()
            .collect()} <= {"PT"}
    sp = C.get_specific_meta_field(
        df, None, "HY", *[r[0] for r in
                          df.filter(F.col("nomvar") == "HY")
                          .select("grid").limit(1).collect()],
        *[(r.dateo, r.deet, r.npas) for r in
          df.filter(F.col("nomvar") == "HY").limit(1).collect()][0])
    assert sp.count() >= 0  # filter path executes


def test_encode_interval_and_timezone(spark):
    df = spark.createDataFrame(
        [(1, 6.0, 12.0)], "id long, ip2_dec double, ip3_dec double")
    out = C.encode_ip2_and_ip3_as_time_interval(df).first()
    assert out.ip2 > 32768 or out.ip2 >= 0  # encoded new-style ips
    tdf = spark.createDataFrame(
        [(1,)], "id long").withColumn(
            "t", F.lit("2024-06-01 12:00:00").cast("timestamp"))
    shifted = C.add_timezone_column(tdf, "t", "America/Montreal")
    cols = [c for c in shifted.columns if c.startswith("t_")]
    assert cols and shifted.select(cols[0]).first()[0] is not None
