"""Cube builder (§2.11) and physical-plan assertion tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.cube import to_cube, to_xarray
from fstd2pandas_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    count_exchanges,
    plan_string,
    read_schema_columns,
    wholestage_codegen_spans,
)


def test_cube_level_axis_sorted(spark, records):
    tt = records.filter(F.col("nomvar") == "TT")
    cubes = {r.ip1_kind: r for r in to_cube(tt).collect()}
    for kind, row in cubes.items():
        assert len(row.cube) == len(row.axis)
        # pressure kind 2 sorts descending; others per ASCENDING_KINDS
        from fstd2pandas_spark.schema import ASCENDING_KINDS

        asc = ASCENDING_KINDS.get(kind, True)
        expect = sorted(row.axis, reverse=not asc)
        assert list(row.axis) == expect
        for layer in row.cube:
            assert len(layer) == row.ni * row.nj


def test_cube_timeseries_axis(spark, records):
    tt = records.filter(F.col("nomvar") == "TT")
    rows = to_cube(tt, by_time=True).collect()
    assert rows
    for r in rows:
        assert list(r.axis) == sorted(r.axis)


def test_cube_matches_rows(spark, records):
    """Every stacked layer is exactly one source record's d array."""
    from fstd2pandas_spark.functions.codecs import decode_ip_value

    tt = records.filter((F.col("nomvar") == "TT"))
    src = {(r.grid, int(r.datev), round(float(r.level), 4)): list(r.d)
           for r in tt.select(
               "grid", "datev", decode_ip_value(F.col("ip1")).alias("level"),
               "d").collect()}
    for row in to_cube(tt).collect():
        for lvl, layer in zip(row.axis, row.cube):
            np.testing.assert_allclose(
                layer, src[(row.grid, int(row.datev), round(float(lvl), 4))])


def test_to_xarray_optional(spark, records):
    pytest.importorskip("xarray")
    ds = to_xarray(records.filter(F.col("nomvar") == "TT"))
    assert len(ds.data_vars) >= 1
    # attributes=True attaches the decoded metadata per DataArray
    # (reference xarray_utils.py convert_to_cmc_xarray attributes flag)
    ds2 = to_xarray(records.filter(F.col("nomvar") == "TT"),
                    attributes=True)
    for name in ds2.data_vars:
        assert ds2[name].attrs["unit"] == "celsius"
        assert ds2[name].attrs["description"] == "Air Temperature"


def test_cube_attributes_table(spark, records):
    """The attrs half of to_xarray(attributes=True), testable without
    xarray: one row per cube group carrying unit/description/parsed
    etiket from the decode pipeline."""
    from fstd2pandas_spark.operators.cube import cube_attributes

    at = cube_attributes(records)
    rows = {(r.grid, r.nomvar, r.ip1_kind, r.datev): r
            for r in at.collect()}
    assert rows
    cube_keys = {(r.grid, r.nomvar, r.ip1_kind, r.datev)
                 for r in to_cube(records).collect()}
    assert set(rows) == cube_keys           # exactly one attrs row per cube
    tt = [r for k, r in rows.items() if k[1] == "TT"]
    assert tt and all(r.unit == "celsius" for r in tt)
    assert all(r.description == "Air Temperature" for r in tt)
    # parsed etiket rides along (f1 TT rows are R1_V710_N; f2's differ)
    assert "R1" in {r.run for r in tt}


# --- plan checks ------------------------------------------------------------

def test_parquet_filter_pushdown(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("doc_id") < 100).select("doc_id")
    assert_pushed_filters(df, "LessThan(doc_id,100)")
    assert read_schema_columns(df) == ["doc_id"]


def test_lookup_joins_are_broadcast(spark, records):
    from fstd2pandas_spark.functions import with_decoded_columns

    decoded = with_decoded_columns(records)
    assert_broadcast_join(decoded, 1)
    assert_no_cartesian(decoded)


def test_fststat_plan_shape(spark, records):
    """Per-record stats are a narrow map: zero shuffles. (Higher-order
    array functions run interpreted, so no codegen-span assertion here.)"""
    from fstd2pandas_spark.operators import fststat

    stats = fststat(records)
    n_shuffles = count_exchanges(stats)
    assert n_shuffles == 0, plan_string(stats, "simple")


def test_fststat_array_pass_census(spark, records):
    """round-16 fold-count lock (the r15 #5 order): the optimized plan's
    higher-order-function census over fststat. Interpreted HOFs get no
    codegen subexpression elimination, so every textual occurrence is a
    real per-row array pass — a future edit that duplicates the keyed
    transform or the NaN probe shows up here as count inflation. The
    current counts are the MEASURED optimum: a single-aggregate fold of
    (min, max, argmin-key, argmax-key, nan-key, sum, sumsq) was A/B'd
    same-process at sf0.1 and LOST (0.85 s vs 0.65 s min-of-5 — the
    per-element struct rebuild costs more than these extra short-array
    passes), as did hoisting the shared scalars behind a projection
    boundary (0.69 s); both parity-identical, both rejected."""
    from fstd2pandas_spark.operators import fststat

    plan = (fststat(records)._jdf.queryExecution()
            .optimizedPlan().toString())
    census = {tok: plan.count(tok) for tok in
              ("aggregate(", "transform(", "array_min(",
               "array_max(", "exists(")}
    assert census["aggregate("] <= 4, census
    assert census["transform("] <= 8, census
    assert census["array_min("] <= 11, census
    assert census["array_max("] <= 3, census
    assert census["exists("] <= 4, census
    # and the stats are actually array-driven (census not vacuous)
    assert census["aggregate("] >= 2 and census["array_min("] >= 1, census


def test_scalar_pipeline_is_codegen(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .filter(F.col("n_chars") > 10)
          .select("doc_id", (F.col("n_chars") * 2).alias("x")))
    assert wholestage_codegen_spans(df) >= 1, plan_string(df)


def test_cube_single_shuffle(spark, records):
    cube = to_cube(records.filter(F.col("nomvar") == "TT"))
    assert count_exchanges(cube) <= 1, plan_string(cube, "simple")
