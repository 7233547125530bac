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
    vector math) whose input may be a single unsplittable file. The
    under-partitioning test counts the scan's input files — a pure
    logical-plan lookup (``inputFiles()``), NOT an ``.rdd`` probe, which
    would force a physical-plan conversion per call. At scale a table
    arrives as >= n files and this returns ``df`` unchanged — no shuffle
    and no plan materialization. Non-file inputs (memory relations) are
    left unchanged: they only occur in tests, where parallelism is moot.
    """
    sc = df.sparkSession.sparkContext
    if n is None:
        n = sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if files and len(files) < n:
        return df.repartition(n)
    return df
