"""Cube builder — the distributed re-expression of the reference's xarray
export (SURVEY §2.11; xarray_utils.py:10-77).

The reference groups by grid, then (nomvar, ip1_kind), sorts each group
by level (direction from the ``ascending`` flag) or by date_of_validity
in timeseries mode, and ``da.stack``s the 2-D arrays into a 3-D cube.
At 100 TB the cube must stay distributed: here it is one row per
(grid, nomvar[, ip1_kind]) holding ``array<array<float>>`` — built with
``collect_list`` + ``sort_array`` inside the aggregation (a single
shuffle on the group key), never a driver collect.

``to_xarray`` is the terminal driver-side convenience (explicitly NOT a
distributed op — SURVEY §7.3e), gated behind an xarray import-try.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.codecs import (
    decode_ip_kind,
    decode_ip_value,
    stamp_to_timestamp,
)
from fstd2pandas_spark.schema import ASCENDING_KINDS, META_NOMVARS

_log = logging.getLogger(__name__)


def _data_rows(df: DataFrame) -> DataFrame:
    """Non-meta rows, keeping NULL nomvar as data (the select.py rule:
    pandas' ~isin keeps NaN; bare ~isin would drop the row entirely)."""
    return df.filter(~F.col("nomvar").isin(META_NOMVARS)
                     | F.col("nomvar").isNull())


def _level_cols(df: DataFrame) -> DataFrame:
    out = df
    if "level" not in df.columns:
        out = out.withColumn("level", decode_ip_value(F.col("ip1")).cast("float"))
    if "ip1_kind" not in df.columns:
        out = out.withColumn("ip1_kind", decode_ip_kind(F.col("ip1")))
    return out


def to_cube(df: DataFrame, by_time: bool = False) -> DataFrame:
    """Stack per-record arrays into per-variable cubes.

    Level mode (default): one row per (grid, nomvar, ip1_kind); the level
    axis is sorted by decoded level, direction taken from the kind's
    ascending convention (std_dec.py:71-85), matching xarray_utils.py:51.

    Timeseries mode (``by_time=True``): one row per (grid, nomvar, ip1);
    axis = date_of_validity (xarray_utils.py:55-57).

    Output columns: group keys + ``axis`` (the sorted coordinate values),
    ``cube`` (array<array<float>>, one inner array per record), ``ni``,
    ``nj`` (validated single-valued per group).
    """
    data = _level_cols(_data_rows(df))
    if by_time:
        keys = ["grid", "nomvar", "ip1"]
        # NTZ has no double cast: the sortable axis value is the
        # TZ-free wall-time epoch (round 17)
        from fstd2pandas_spark.functions.timeutil import ntz_epoch_us
        axis = (ntz_epoch_us(stamp_to_timestamp(F.col("datev")))
                / F.lit(1_000_000.0)).cast("double")
        sort_sign = F.lit(1.0)
    else:
        # datev in the key: the reference's "one datev per group" invariant
        # (A4, std_vgrid.py:131-153) — one cube per variable per valid time
        keys = ["grid", "nomvar", "ip1_kind", "datev"]
        axis = F.col("level").cast("double")
        # descending-level kinds sort by -level (xarray_utils.py:51; W2)
        asc_expr = F.lit(True)
        for kind, asc in ASCENDING_KINDS.items():
            asc_expr = F.when(F.col("ip1_kind") == kind, F.lit(asc)) \
                        .otherwise(asc_expr)
        sort_sign = F.when(asc_expr, F.lit(1.0)).otherwise(F.lit(-1.0))

    stacked = (
        data.withColumn("_axis", axis)
        .withColumn("_sort", F.col("_axis") * sort_sign)
        .groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_sort", "_axis", "d"))
            ).alias("_s"),
            # min/max instead of count_distinct: count_distinct would add
            # an Expand + a second shuffle (3x shuffle volume at scale)
            F.min("ni").alias("_ni_lo"), F.max("ni").alias("ni"),
            F.min("nj").alias("_nj_lo"), F.max("nj").alias("nj"),
        )
    )
    return stacked.select(
        *keys,
        F.transform("_s", lambda s: s["_axis"]).alias("axis"),
        F.transform("_s", lambda s: s["d"]).alias("cube"),
        "ni", "nj",
        ((F.col("_ni_lo") != F.col("ni"))
         | (F.col("_nj_lo") != F.col("nj"))).alias("ragged"),
    )


#: attrs attached per DataArray when ``attributes=True`` — the decoded
#: metadata the reference keeps (xarray_utils.py:80-108: the row dict
#: minus structural keys like ip*/ig*/datev/grid/shape/d)
XARRAY_ATTR_COLS = [
    "typvar", "deet", "npas", "unit", "description", "run",
    "implementation", "ensemble_member", "label", "ip1_kind", "ip1_pkind",
    "surface", "follow_topography", "ascending", "data_type_str",
    "forecast_hour", "date_of_observation", "date_of_validity",
]


def _cube_keys(by_time: bool) -> "list[str]":
    return (["grid", "nomvar", "ip1"] if by_time
            else ["grid", "nomvar", "ip1_kind", "datev"])


def cube_attributes(df: DataFrame, by_time: bool = False) -> DataFrame:
    """Distributed attrs table for :func:`to_xarray(attributes=True)`:
    one row per cube group holding the first non-null value of every
    :data:`XARRAY_ATTR_COLS` column (decoded via with_decoded_columns —
    unit/description dictionary join, parsed etiket, kind flags). Kept
    as a DataFrame so the attrs computation itself never collects more
    than one row per cube."""
    from fstd2pandas_spark.functions.meta import with_decoded_columns

    dec = _level_cols(with_decoded_columns(_data_rows(df)))
    attr_cols = [c for c in XARRAY_ATTR_COLS if c in dec.columns]
    # deterministic "first": the reference takes the attrs of ONE row
    # of the group (file order) — with the (path, key) identity present
    # that is min_by, the same value every run; F.first alone is
    # whichever partition finished (a different attrs dict per run for
    # any attr that varies within the group, e.g. forecast_hour in a
    # by_time group)
    if {"path", "key"} <= set(dec.columns):
        order = F.struct("path", "key")
        aggs = [F.min_by(F.col(c), order).alias(c) for c in attr_cols]
    else:
        aggs = [F.first(c, ignorenulls=True).alias(c) for c in attr_cols]
    return dec.groupBy(*_cube_keys(by_time)).agg(*aggs)


def to_xarray(df: DataFrame, by_time: bool = False,
              attributes: bool = False):
    """Driver-side xarray export of :func:`to_cube` output. Requires the
    optional ``xarray`` dependency; raises ImportError otherwise. Collect
    happens here — use only on selections that fit in driver memory.

    ``attributes=True`` (reference xarray_utils.py:10-77,
    ``convert_to_cmc_xarray(attributes=True)``): each DataArray carries
    the decoded metadata of its group (unit, description, parsed etiket,
    kind flags — :data:`XARRAY_ATTR_COLS`) as attrs, computed
    distributed (one first-value aggregation per cube group) and
    collected alongside the cubes."""
    try:
        import xarray as xr
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "xarray is not installed in this environment; "
            "to_cube() output is the distributed equivalent"
        ) from exc
    import numpy as np

    keys = _cube_keys(by_time)
    attrs_by_key: dict = {}
    if attributes:
        attr_df = cube_attributes(df, by_time=by_time)
        attr_cols = [c for c in attr_df.columns if c not in keys]
        for r in attr_df.collect():
            attrs_by_key[tuple(r[k] for k in keys)] = {
                c: r[c] for c in attr_cols if r[c] is not None}

    rows = to_cube(df, by_time=by_time).collect()
    ragged = [r for r in rows if r.ragged]
    if ragged:
        # never a silent skip: a ragged group (mixed ni/nj) cannot
        # stack — the reference would crash on the reshape; name the
        # dropped cubes so the caller knows the Dataset is partial
        _log.warning(
            "to_xarray: %d cube group(s) are ragged (mixed ni/nj) and "
            "were NOT exported: %s", len(ragged),
            [tuple(r[k] for k in keys) for r in ragged[:10]])
    arrays = {}
    for r in rows:
        if r.ragged:
            continue
        cube = np.array([np.asarray(layer, dtype=np.float32).reshape(r.nj, r.ni)
                         for layer in r.cube])
        dim0 = "time" if by_time else "level"
        # the name must carry the FULL cube key: by_time groups are
        # (grid, nomvar, ip1) — naming only nomvar_grid would let a
        # multi-level variable's cubes overwrite each other in the dict
        name = (f"{r.nomvar}_{r.grid}_{r.ip1}" if by_time
                else f"{r.nomvar}_{r.grid}_{r.ip1_kind}_{r.datev}")
        arrays[name] = xr.DataArray(
            cube, dims=(dim0, "y", "x"),
            coords={dim0: list(r.axis)}, name=name,
            attrs=attrs_by_key.get(tuple(r[k] for k in keys), {}))
    return xr.Dataset(arrays)
