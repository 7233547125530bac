"""Bucketed layouts for shuffle-free co-located joins (SURVEY §4 / the
100 TB design): persist both sides of a recurring big-big join bucketed
and sorted on the join key, and every subsequent join planwise degrades
from shuffle+sort+merge to a zero-exchange merge of pre-sorted buckets.

The record-table idiom: fact-scale record tables joining repeatedly on
``grid`` (or ``key``) pay one bucketed write, then metadata-association
and mask-pairing joins run exchange-free. Spark's bucket info only
attaches through the session catalog, hence table names rather than bare
paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: "list[str]",
                   num_buckets: int, path: "str | None" = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed+sorted parquet table.

    ``num_buckets`` should divide evenly into the cluster's parallelism
    and keep each bucket's largest key-group in executor memory — at
    100 TB that means thousands of buckets, not dozens.
    """
    writer = (
        df.write.format("parquet")
        .bucketBy(num_buckets, *keys).sortBy(*keys)
        .mode(mode)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """The bucketed table WITH its bucket spec (a bare parquet read of
    the same files would lose it and re-shuffle on join)."""
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: "list[str]", how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — planwise a
    zero-exchange sort-merge join when both tables share bucket count
    and keys."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how)
