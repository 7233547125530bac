"""Reference-named compatibility layer: every function here keeps the
NAME and call shape a user of the reference already types (fstpy
``dataframe.py`` / ``dataframe_utils.py`` / ``std_dec.py`` /
``unit.py`` / ``xarray_utils.py``), delegating to this engine's native
Column-expression operators.  Together with :mod:`fstd2pandas_spark.api`
(StandardFileReader/Writer) this is the drop-in surface: change the
import, keep the call sites.

Two deliberate deviations, both scale-driven:

- functions return (lazy) Spark DataFrames, not pandas — append
  ``.toPandas()`` for the reference's terminal behavior;
- reference functions that *print* (voir, fststat) return the frame
  instead; ``.show()`` restores the printing.
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.codecs import (
    decode_ip_py,
    encode_ip_from_user_py,
    forecast_hour_seconds,
    stamp_to_datetime_py,
    stamp_to_timestamp,
)
from fstd2pandas_spark.functions.meta import (
    data_type_str,
    grid_identifier,
    kind_str,
    parsed_etiket,
    typvar_flags,
    with_decoded_columns,
)
from fstd2pandas_spark.lookups import get_unit_row, stdvar_df


# --- dataframe.py column adders (reference dataframe.py:291-629) -----
#
# Reference contract: every adder "replaces original column(s) if
# present" — so each wrapper drops its own outputs before re-adding,
# which also makes add_columns idempotent and order-insensitive.

_ETIKET_COLS = ("label", "run", "implementation", "ensemble_member")
_FLAG_COLS = ("multiple_modifications", "zapped", "filtered",
              "interpolated", "unit_converted", "bounded", "missing_data",
              "ensemble_extra_info")
_IP_INFO_COLS = _ETIKET_COLS + _FLAG_COLS + (
    "date_of_observation", "date_of_validity", "forecast_hour",
    "data_type_str", "level", "ip1_kind", "ip1_pkind", "ip2_dec",
    "ip2_kind", "ip2_pkind", "ip3_dec", "ip3_kind", "ip3_pkind",
    "surface", "follow_topography", "ascending", "interval", "unit",
    "description")


def _replacing(df: DataFrame, cols: "tuple[str, ...]") -> DataFrame:
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def add_parsed_etiket_columns(df: DataFrame) -> DataFrame:
    """label/run/implementation/ensemble_member from etiket
    (reference dataframe.py:316-333)."""
    df = _replacing(df, _ETIKET_COLS)
    et = parsed_etiket(F.col("etiket"))
    return df.select(
        "*", et["label"].alias("label"), et["run"].alias("run"),
        et["implementation"].alias("implementation"),
        et["ensemble_member"].alias("ensemble_member"))


def add_unit_and_description_columns(df: DataFrame) -> DataFrame:
    """unit/description via the stdvar dictionary broadcast join
    (reference dataframe.py:358-387)."""
    df = _replacing(df, ("unit", "description"))
    lookup = F.broadcast(stdvar_df().select(
        "nomvar", F.col("unit").alias("_u"),
        F.col("description_en").alias("_d")))
    return (
        df.join(lookup, "nomvar", "left")
        .withColumn("unit", F.coalesce(F.col("_u"), F.lit("scalar")))
        .withColumn("description", F.coalesce(F.col("_d"), F.lit("")))
        .drop("_u", "_d"))


def add_decoded_date_column(df: DataFrame, attr: str = "dateo") -> DataFrame:
    """date_of_observation / date_of_validity from the RMN stamp
    (reference dataframe.py:390-433)."""
    out = ("date_of_observation" if attr == "dateo" else "date_of_validity")
    return _replacing(df, (out,)).withColumn(out, stamp_to_timestamp(F.col(attr)))


def add_forecast_hour_column(df: DataFrame) -> DataFrame:
    """forecast_hour (seconds, deet*npas) — reference
    dataframe.py:440-468 keeps a timedelta; seconds are its integral."""
    return _replacing(df, ("forecast_hour",)).withColumn(
        "forecast_hour", forecast_hour_seconds(F.col("deet"), F.col("npas")))


def add_data_type_str_column(df: DataFrame) -> DataFrame:
    """datyp -> letter code (reference dataframe.py:471-497)."""
    return _replacing(df, ("data_type_str",)).withColumn(
        "data_type_str", data_type_str(F.col("datyp")))


def add_flag_values(df: DataFrame) -> DataFrame:
    """The 8 typvar-derived boolean flags (reference
    dataframe.py:208-213)."""
    return _replacing(df, _FLAG_COLS).select(
        "*", *typvar_flags(F.col("typvar")))


def add_shape_column(df: DataFrame) -> DataFrame:
    """(ni, nj) shape struct (reference dataframe.py:291-314)."""
    return _replacing(df, ("shape",)).withColumn(
        "shape", F.struct(F.col("ni"), F.col("nj")))


def add_ip_info_columns(df: DataFrame) -> DataFrame:
    """The full ip-decode family: level/kind/pkind for ip1/2/3 plus
    surface/follow_topography/ascending/interval (reference
    dataframe.py:500-579).

    Deliberate SUPERSET of the reference's variant: it delegates to the
    single-select decode cascade (:func:`with_decoded_columns`), which
    also adds/replaces unit, description, the decoded dates,
    forecast_hour, data_type_str and the 8 typvar flags — pre-existing
    columns of those names are replaced, matching every adder's
    "replaces original column(s) if present" contract.  Pruning back to
    just the ip family would leave a dead stdvar broadcast join in the
    plan that Catalyst cannot remove, so the extra columns are kept;
    select them away afterwards if they are unwanted."""
    return with_decoded_columns(_replacing(df, _IP_INFO_COLS))


def add_columns(df: DataFrame, columns: "str | list[str]" = (
        "flags", "etiket", "unit", "dateo", "datev", "forecast_hour",
        "datyp", "ip_info")) -> DataFrame:
    """The reference's column-adder dispatcher (dataframe.py:582-629),
    same subset keywords.  Unknown keywords are skipped with a logged
    warning, matching the reference's behavior.

    When ``'ip_info'`` is requested, the single-select decode cascade
    already produces every column the other adders would (etiket parse,
    unit/description join, decoded dates, forecast_hour, datyp letter,
    typvar flags), so those adders are skipped — running them first and
    dropping their outputs would leave a dead stdvar broadcast join in
    the plan that Catalyst cannot prune.
    """
    if isinstance(columns, str):
        columns = [columns]
    known = {"flags", "etiket", "unit", "dateo", "datev", "forecast_hour",
             "datyp", "ip_info"}
    for unknown in [c for c in columns if c not in known]:
        logging.getLogger(__name__).warning(
            "add_columns: unknown column keyword %r ignored", unknown)
    if "ip_info" in columns:
        from fstd2pandas_spark.operators.vgrid import (
            set_vertical_coordinate_type)

        return set_vertical_coordinate_type(
            with_decoded_columns(_replacing(df, _IP_INFO_COLS + ("vctype",))))
    if "etiket" in columns:
        df = add_parsed_etiket_columns(df)
    if "unit" in columns:
        df = add_unit_and_description_columns(df)
    if "dateo" in columns:
        df = add_decoded_date_column(df, "dateo")
    if "datev" in columns:
        df = add_decoded_date_column(df, "datev")
    if "forecast_hour" in columns:
        df = add_forecast_hour_column(df)
    if "datyp" in columns:
        df = add_data_type_str_column(df)
    if "flags" in columns:
        df = add_flag_values(df)
    return df


def add_grid_column(df: DataFrame) -> DataFrame:
    """grid identifier column (reference dataframe.py:20-45)."""
    from fstd2pandas_spark.operators.metadata import (
        add_grid_column as _impl)

    return _impl(df)


def reorder_columns(df: DataFrame) -> DataFrame:
    """voir-style column order (reference dataframe_utils.py:634-650);
    order-preserving — contrast with :func:`voir` which also sorts."""
    ordered = ["nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo",
               "ip1", "ip2", "ip3", "deet", "npas", "datyp", "nbits",
               "grtyp", "ig1", "ig2", "ig3", "ig4"]
    present = [c for c in ordered if c in df.columns]
    rest = [c for c in df.columns if c not in ordered]
    return df.select(*present, *rest)


def create_empty_dataframe(spark, num_rows: int = 1, **overrides) -> DataFrame:
    """Template record table with the full schema (reference
    dataframe.py:675-700)."""
    from fstd2pandas_spark.schema import empty_record_table

    return empty_record_table(spark, num_rows, **overrides)


# --- std_dec.py scalar decoders (driver-side helpers) ----------------

def convert_rmndate_to_datetime(stamp: int):
    """Scalar RMN stamp -> datetime (reference std_dec.py)."""
    return stamp_to_datetime_py(stamp)


def decode_ip123(ip1: int, ip2: int, ip3: int):
    """Scalar (value, kind) triples for ip1/2/3 (reference
    std_dec.py ``decode_ip123``, via librmn DecodeIp)."""
    return tuple(decode_ip_py(ip) for ip in (ip1, ip2, ip3))


def ip_from_value_and_kind(value: float, pkind: str) -> int:
    """Scalar encode from (value, printable kind) — reference
    utils.py:79-108."""
    return encode_ip_from_user_py(value, pkind)


def get_grid_identifier(nomvar="nomvar", ip1="ip1", ip2="ip2",
                        ig1="ig1", ig2="ig2") -> Column:
    """Grid identifier expression from column names or Columns
    (reference std_dec.py ``get_grid_identifier``); prefer
    :func:`add_grid_column` for the DataFrame form."""
    def c(v):
        return v if isinstance(v, Column) else F.col(v)

    return grid_identifier(c(nomvar), c(ip1), c(ip2), c(ig1), c(ig2))


def kind_to_string(kind: "int | Column") -> Column:
    """kind -> printable suffix (reference std_dec.py)."""
    return kind_str(F.lit(kind) if isinstance(kind, int) else kind)


# --- unit.py ---------------------------------------------------------

def get_unit_by_name(name: str) -> dict:
    """One unit row from the dictionary (reference unit.py:307-323)."""
    return get_unit_row(name)


def unit_convert_array(arr, from_unit_name: str,
                       to_unit_name: str = "scalar") -> np.ndarray:
    """numpy array conversion (reference unit.py:230-256): identity when
    either side is 'scalar' or units match or families differ."""
    if from_unit_name == to_unit_name or "scalar" in (from_unit_name,
                                                      to_unit_name):
        return arr
    u_from, u_to = get_unit_row(from_unit_name), get_unit_row(to_unit_name)
    if u_from["expression"] != u_to["expression"]:
        return arr
    scale = u_from["factor"] / u_to["factor"]
    offset = (u_from["bias"] - u_to["bias"]) / u_to["factor"]
    return np.asarray(arr) * scale + offset


# --- grid / meta / xarray re-exports under reference names -----------

def get_lat_lon(df: DataFrame) -> DataFrame:
    """2-D latitude/longitude fields for every grid (reference
    std_grid.py ``get_lat_lon`` / dataframe_utils ``get_2d_lat_lon_df``)."""
    from fstd2pandas_spark.operators.grid import grid_lat_lon

    return grid_lat_lon(df)


get_2d_lat_lon_df = get_lat_lon


def get_df_from_grid(spark, grid_params: dict) -> DataFrame:
    """Axis records from grid parameters (reference std_grid.py:13-44)."""
    from fstd2pandas_spark.operators.grid import df_from_grid

    return df_from_grid(spark, grid_params)


def get_meta_fields_exists(df: DataFrame) -> DataFrame:
    """Per-grid meta-field presence flags (reference
    dataframe_utils.py:653-668)."""
    from fstd2pandas_spark.operators.vgrid import meta_fields_exists

    return meta_fields_exists(df)


meta_exists = get_meta_fields_exists


def to_cmc_xarray(df: DataFrame, attributes: bool = False):
    """Cube export (reference xarray_utils.py ``to_cmc_xarray``)."""
    from fstd2pandas_spark.operators.cube import to_xarray

    return to_xarray(df, attributes=attributes)


convert_to_cmc_xarray = to_cmc_xarray


def compute_stats(df: DataFrame) -> DataFrame:
    """Per-record summary stats (reference dataframe_utils.py:160-168)."""
    from fstd2pandas_spark.operators.stats import fststat

    return fststat(df)
