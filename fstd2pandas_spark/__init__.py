"""fstd2pandas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``sebastiendfortier/fstd2pandas`` (fstpy).

The reference converts RPN standard-file (FST) records into pandas
DataFrames (one row per 2-D field record) and layers metadata decoding,
selection, metadata association, statistics, unit conversion, vertical
coordinates (pressure), and masking on top (see SURVEY.md). This package
re-expresses that data model and every operator Spark-first:

- the record catalog is a Spark ``DataFrame`` with a fixed ``StructType``
  (:mod:`fstd2pandas_spark.schema`);
- per-record 2-D field data is an ``array<float>`` column (row-major,
  ``ni`` fastest) materialized lazily and pruned by Catalyst;
- all decoders are native Column expressions or broadcast joins
  (:mod:`fstd2pandas_spark.functions`);
- all compute operators are DataFrame transformations
  (:mod:`fstd2pandas_spark.operators`);
- sources/sinks are Spark (streaming-capable) data sources
  (:mod:`fstd2pandas_spark.sources`);
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) live in
  :mod:`fstd2pandas_spark.operators.llm`.

Designed for 100 TB scale: declarative plans (Catalyst pushdown + pruning),
broadcast joins for all lookup tables, no driver-side loops in hot paths,
Arrow-batched pandas UDFs only where built-ins cannot express the semantics.
"""

from fstd2pandas_spark.session import get_spark
from fstd2pandas_spark.schema import (
    BASE_COLUMNS,
    RECORD_SCHEMA,
    META_NOMVARS,
    DATYP_DICT,
    KIND_DICT,
)
from fstd2pandas_spark.api import (
    QuickPressure,
    StandardFileReader,
    StandardFileWriter,
)


def __getattr__(name):
    """Reference-named helpers, lazily bound so importing the package
    stays light (mirrors fstpy's top-level exports: select_with_meta,
    fststat, voir, metadata_cleanup, unit_convert, ...)."""
    _LAZY = {
        "select_with_meta": ("operators.select", "select_with_meta"),
        "select_meta": ("operators.select", "select_meta"),
        "select_no_meta": ("operators.select", "select_no_meta"),
        "fststat": ("operators.stats", "fststat"),
        "voir": ("operators.stats", "voir"),
        "metadata_cleanup": ("operators.metadata", "metadata_cleanup"),
        "unit_convert": ("operators.units", "unit_convert"),
        "quick_pressure": ("operators.pressure", "quick_pressure"),
        "apply_mask": ("operators.mask", "apply_mask"),
        "recover_mask": ("operators.mask", "recover_mask"),
        "grid_lat_lon": ("operators.grid", "grid_lat_lon"),
        "is_global_grid": ("operators.grid", "is_global_grid"),
        "to_cube": ("operators.cube", "to_cube"),
        "to_xarray": ("operators.cube", "to_xarray"),
        "with_decoded_columns": ("functions.meta", "with_decoded_columns"),
        "drop_duplicates": ("operators.dedup", "drop_duplicates"),
        "csv_to_records": ("sources.csv_source", "read_csv_records"),
    }
    # full reference-named surface (add_columns, decode_ip123,
    # get_lat_lon, to_cmc_xarray, ...) lives in compat.py
    if name == "compat":
        import importlib

        return importlib.import_module("fstd2pandas_spark.compat")
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(f"fstd2pandas_spark.{mod}"),
                       attr)
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "BASE_COLUMNS",
    "RECORD_SCHEMA",
    "META_NOMVARS",
    "DATYP_DICT",
    "KIND_DICT",
    "StandardFileReader",
    "StandardFileWriter",
    "QuickPressure",
]
