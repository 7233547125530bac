"""DataFrame transformation operators (SURVEY.md §2.2-§2.9).

Each operator is a pure function ``DataFrame -> DataFrame`` built from
declarative Spark expressions so Catalyst can push filters into scans,
prune ``d`` when untouched, and broadcast the lookup joins.
"""

from fstd2pandas_spark.operators.select import (
    select_meta,
    select_with_meta,
    add_metadata_to_query_results,
    query_with_meta,
    SelectError,
)
from fstd2pandas_spark.operators.metadata import (
    add_grid_column,
    metadata_cleanup,
)
from fstd2pandas_spark.operators.vgrid import (
    meta_fields_exists, toctoc_from_vgrid,
    set_vertical_coordinate_type,
)
from fstd2pandas_spark.operators.stats import fststat, voir
from fstd2pandas_spark.operators.dedup import drop_duplicates, group_invariant_violations
from fstd2pandas_spark.operators.units import unit_convert, converter_columns
from fstd2pandas_spark.operators.mask import apply_mask, recover_mask
from fstd2pandas_spark.operators.pressure import quick_pressure
from fstd2pandas_spark.operators.grid import (
    df_from_grid,
    grid_lat_lon,
    grid_metadata_for,
    is_global_grid,
)
from fstd2pandas_spark.operators.cube import to_cube, to_xarray
from fstd2pandas_spark.operators.sessions import sessionize
from fstd2pandas_spark.operators.funnel import (
    funnel_steps, funnel_counts, counts_from_steps, retention_cohorts,
    user_activity_report, cohorts_from_report,
)
from fstd2pandas_spark.operators.temporal import asof_join, range_join
from fstd2pandas_spark.operators.graph import pagerank
from fstd2pandas_spark.operators.quantiles import (
    group_quantiles_disc, quantile_flags,
)
from fstd2pandas_spark.operators.linfit import group_linfit
from fstd2pandas_spark.operators.sketch import (
    countmin_counters, countmin_estimate, merge_counters,
    countmin_heavy_hitters, hll_registers, hll_estimate,
    bloom_bits, bloom_might_contain,
    linear_count_occupied, linear_count_estimate,
    kmins_minima, kmins_merge, kmins_agreement, kmins_estimate,
    histogram_sketch, histogram_merge, histogram_quantile,
)
from fstd2pandas_spark.operators.validation import (
    grouped_quality_report,
    table_quality_report,
)

__all__ = [
    "select_meta", "select_with_meta", "add_metadata_to_query_results",
    "query_with_meta", "SelectError", "add_grid_column", "metadata_cleanup",
    "set_vertical_coordinate_type", "meta_fields_exists", "toctoc_from_vgrid", "fststat", "voir",
    "drop_duplicates", "group_invariant_violations", "unit_convert",
    "converter_columns", "apply_mask", "recover_mask", "quick_pressure",
    "df_from_grid", "grid_lat_lon", "grid_metadata_for", "is_global_grid",
    "to_cube", "to_xarray",
    "sessionize", "funnel_steps", "funnel_counts", "counts_from_steps",
    "retention_cohorts", "user_activity_report", "cohorts_from_report",
    "asof_join", "range_join", "pagerank",
    "countmin_counters", "countmin_estimate", "merge_counters",
    "countmin_heavy_hitters", "hll_registers", "hll_estimate",
    "bloom_bits", "bloom_might_contain",
    "linear_count_occupied", "linear_count_estimate",
    "kmins_minima", "kmins_merge", "kmins_agreement", "kmins_estimate",
    "histogram_sketch", "histogram_merge", "histogram_quantile",
    "group_quantiles_disc", "quantile_flags", "group_linfit",
    "table_quality_report", "grouped_quality_report",
]
