"""Record deduplication + group invariants (SURVEY §2.5 A2-A6;
reference dataframe.py:268-287, std_vgrid.py:131-153, csv_reader.py:475-487).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import DEDUP_COLUMNS


def drop_duplicates(df: DataFrame) -> DataFrame:
    """Dedupe on the 19-key metadata subset, keeping an arbitrary first
    (dataframe.py:268-287; ``ig2`` deliberately excluded from the key)."""
    return df.dropDuplicates(DEDUP_COLUMNS)


def group_invariant_violations(df: DataFrame, group_keys: list[str],
                               invariant_cols: list[str]) -> DataFrame:
    """Groups violating a 'one distinct value per group' invariant
    (A4: one grid / one datev / one vctype per group; ni,nj consistency).

    Returns (group_keys..., col, n_distinct) rows for every violated
    invariant — the Spark form of the reference's raise-on-unique()>1
    checks (std_vgrid.py:131-153, dataframe_utils.py:344-348,
    csv_reader.py:475-487).

    NULL counts as a distinct value: pandas' ``unique()`` includes NaN,
    so the reference flags a group holding {1, NaN} — bare
    countDistinct SKIPS NULLs and would read that group as invariant
    (a hidden violation). All-NULL stays 1 distinct, matching
    ``unique() == [NaN]``."""
    aggs = [(F.countDistinct(c)
             + F.max(F.col(c).isNull().cast("int"))).alias(c)
            for c in invariant_cols]
    counted = df.groupBy(*group_keys).agg(*aggs)
    stacked = counted.select(
        *group_keys,
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in invariant_cols]),
                F.array(*[F.col(c) for c in invariant_cols]),
            )
        ).alias("col", "n_distinct"),
    )
    return stacked.filter(F.col("n_distinct") > 1)


def kinds_and_ip1(df: DataFrame) -> DataFrame:
    """Distinct ip1 grouped by decoded kind (A5, dataframe_utils.py:186-197):
    returns (kind, ip1s array)."""
    from fstd2pandas_spark.functions.codecs import decode_ip_kind

    return (
        df.select("ip1").distinct()
        .withColumn("kind", decode_ip_kind(F.col("ip1")))
        .groupBy("kind").agg(F.sort_array(F.collect_list("ip1")).alias("ip1s"))
    )
