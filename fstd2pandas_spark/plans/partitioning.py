"""Partitioning helpers for compute-heavy operators.

At production scale an input table arrives in many partitions (one per
file split), so per-row compute parallelizes naturally. The local test
fixtures are single-file / single-row-group parquet, which Spark cannot
split — every downstream expression would run on ONE core. These helpers
raise parallelism only when the input is under-partitioned, and are
no-ops (not even an exchange) on well-partitioned inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``n`` (default: the cluster's
    defaultParallelism) iff the plan currently has fewer partitions.

    Use ahead of expensive per-row expressions (hashing, shingling,
    vector math) whose input may be a single unsplittable file. On an
    input that already has >= n partitions this returns ``df`` unchanged
    — no shuffle is added, so it is safe at any scale.
    """
    sc = df.sparkSession.sparkContext
    if n is None:
        n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
