"""Selection operators (SURVEY §2.2 F1-F5).

Parity targets:
- select_meta                      dataframe_utils.py:21-24
- select_with_meta                 dataframe_utils.py:27-64
- add_metadata_to_query_results    std_io.py:77-94 (left-semi join on grid)
- process_hy                       std_io.py:97-124

The validation in ``select_with_meta`` ("error if any requested nomvar is
missing") is one tiny aggregate over the pruned nomvar column — Catalyst
reads only that column from the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import META_NOMVARS


class SelectError(Exception):
    pass


def select_meta(df: DataFrame) -> DataFrame:
    """Rows whose nomvar is one of the 8 reserved descriptor names."""
    return df.filter(F.col("nomvar").isin(META_NOMVARS))


def select_no_meta(df: DataFrame) -> DataFrame:
    """Rows that are real data fields (complement of :func:`select_meta`)."""
    return df.filter(~F.col("nomvar").isin(META_NOMVARS))


def select_with_meta(df: DataFrame, nomvars: "str | list[str]",
                     cleanup: bool = True) -> DataFrame:
    """Select fields by nomvar plus their accompanying meta records.

    Raises :class:`SelectError` if any requested nomvar is absent — checked
    with a single small aggregate (count per requested name) before
    returning the lazy selection.
    """
    if isinstance(nomvars, str):
        nomvars = [nomvars]
    if not nomvars:
        raise SelectError("nomvar is empty - nothing to select")

    present = {
        r["nomvar"]
        for r in df.filter(F.col("nomvar").isin(nomvars))
        .select("nomvar").distinct().collect()
    }
    missing = [v for v in nomvars if v not in present]
    if missing:
        raise SelectError(f"missing {missing} in dataframe")

    out = df.filter(F.col("nomvar").isin(nomvars) | F.col("nomvar").isin(META_NOMVARS))
    if cleanup:
        from fstd2pandas_spark.operators.metadata import metadata_cleanup
        out = metadata_cleanup(out)
    return out


def add_metadata_to_query_results(result_df: DataFrame, meta_df: DataFrame) -> DataFrame:
    """Re-attach the meta records whose grid appears in a query result
    (std_io.py:77-94): a left-semi join against the result's distinct grids,
    then UNION ALL.

    At scale the distinct-grid side is tiny (grids per dataset ~ dozens), so
    the semi-join broadcasts automatically.
    """
    grids = result_df.select("grid").distinct()
    kept_meta = meta_df.join(F.broadcast(grids), "grid", "leftsemi")
    return result_df.unionByName(kept_meta, allowMissingColumns=True)


def process_hy(df: DataFrame) -> DataFrame:
    """Keep at most one HY record and stamp it with the data rows' grid
    (std_io.py:97-124). HY is grid-independent (grid='None' at decode), so
    the single surviving row is cross-joined to the first data grid."""
    hy = df.filter(F.col("nomvar") == "HY").limit(1)
    rest = df.filter(F.col("nomvar") != "HY")
    first_grid = rest.filter(~F.col("nomvar").isin(META_NOMVARS)) \
        .select(F.first("grid").alias("_g")).limit(1)
    hy_stamped = hy.drop("grid").crossJoin(F.broadcast(first_grid)) \
        .withColumnRenamed("_g", "grid")
    return rest.unionByName(hy_stamped.select(*rest.columns))


def query_with_meta(df: DataFrame, predicate: str) -> DataFrame:
    """The reader's ``query`` pushdown (F1, std_io.py:44-49): filter data
    rows on a SQL predicate *before any field data is materialized*, then
    re-attach the meta records of the surviving grids.

    ``predicate`` is a Spark SQL boolean expression over the metadata
    columns (e.g. ``"nomvar in ('TT','UV') and ip2 == 0"``); Catalyst pushes
    it into the source scan.
    """
    meta_df = select_meta(df)
    result = select_no_meta(df).filter(F.expr(predicate))
    return add_metadata_to_query_results(result, meta_df)
