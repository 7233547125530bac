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
    """Rows that are real data fields (complement of :func:`select_meta`).

    A NULL nomvar is a DATA row: pandas' ``~isin`` keeps NaN (isin is
    False for NaN), so the reference's meta/data split is a true
    partition — Spark's ``~isin`` alone would evaluate NULL and drop
    the row from BOTH halves, silently losing it from every query."""
    return df.filter(~F.col("nomvar").isin(META_NOMVARS)
                     | F.col("nomvar").isNull())


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
    """Keep at most one HY record and stamp it with the rest's first
    grid (std_io.py:97-124). HY is grid-independent (grid='None' at
    decode), so the single surviving row is cross-joined to the first
    surviving grid.

    Determinism + parity contract (round-15 review):

    - "first" is first in ``(path, key)`` order — the reference's
      ``iloc[0]`` / ``grid.unique()[0]`` are ROW-ORDER firsts (file
      order), and an unordered ``F.first``/``limit(1)`` here would be
      whichever partition finished, a different answer per run.
    - the grid comes from ALL non-HY rows (std_io.py:118 takes
      ``df.grid.unique()[0]`` of the whole hy-less frame, meta rows
      included), not just data rows.
    - when NOTHING else survives, the reference returns df unchanged
      (std_io.py:107 ``if df.empty: return df``) — i.e. HY is DROPPED,
      never stamped with a fabricated NULL grid. The ``limit(1)`` on a
      plain projection (zero rows when rest is empty, vs. a global
      aggregate's one NULL row) gets that for free, lazily.
    - a NULL nomvar survives the ``!= 'HY'`` split (pandas: NaN != x
      is True; Spark alone would drop the row entirely).

    Frames without the (path, key) identity columns (synthetic record
    tables) order by whichever of the two they have; with neither, the
    pick falls back to the old arbitrary ``limit(1)``."""
    order = [F.col(c).asc_nulls_first()
             for c in ("path", "key") if c in df.columns]
    hy = df.filter(F.col("nomvar") == "HY")
    rest = df.filter((F.col("nomvar") != "HY")
                     | F.col("nomvar").isNull())
    first_src = rest.orderBy(*order) if order else rest
    first_grid = first_src.select(F.col("grid").alias("_g")).limit(1)
    hy = (hy.orderBy(*order) if order else hy).limit(1)
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
