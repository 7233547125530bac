"""Partition-level content fingerprints — the incremental-processing
primitive ("which partitions changed since the last run?").

A 100 TB pipeline cannot afford to reprocess the world on every run:
the standard pattern is to fingerprint each partition's CONTENT, diff
against the previous snapshot's fingerprints (a partitions-sized
table, kilobytes), and reprocess only new/changed partitions. File
mtimes and row counts alone miss in-place rewrites and compaction; a
content fingerprint doesn't.

Determinism contract (what makes the fingerprint trustworthy AND
oracle-gatable): each row hashes to md5 over a seed + the unit-
separator-joined content columns, and the partition fingerprint is the
SUM of two 32-bit digest slices — integer sums are associative and
order-free, so the fingerprint is identical on any engine,
partitioning, shuffle order or file layout, and two snapshots of the
same content always agree. Content columns must be integer / string /
date-like (their canonical string casts agree across engines); FLOAT
columns must be quantized by the caller first — the
:func:`~fstd2pandas_spark.operators.linfit.group_linfit` contract —
because float-to-string formatting is engine-specific.

Scale shape: ONE map-side-combinable aggregation over the partition
key — three longs of state per partition; the diff join is
partitions-sized on both sides. Sum overflow headroom: two 32-bit
slices (< 2^32) summed over up to ~2^31 rows per partition stay
within int64; a partition beyond two billion rows is mis-partitioned
long before the fingerprint wraps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ASCII unit separator — joins content columns so ("ab","c") and
#: ("a","bc") hash differently
_SEP = "\x1f"


def partition_fingerprints(df: DataFrame, part_cols: "list[str]",
                           content_cols: "list[str]",
                           seed: str = "snap1") -> DataFrame:
    """``(*part_cols, n_rows, fp_a, fp_b)``: per-partition row count
    plus two order-free 64-bit content fingerprint sums (independent
    32-bit md5 slices — a collision must fool both). NULL content
    values hash as the empty string (position still separated, so a
    NULL is distinct from absence but identical across engines)."""
    if not part_cols or not content_cols:
        raise ValueError("need at least one partition and content column")
    h = F.md5(F.concat_ws(
        _SEP, F.lit(seed),
        *[F.coalesce(F.col(c).cast("string"), F.lit(""))
          for c in content_cols]))
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return (df.groupBy(*part_cols)
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(a).cast("long").alias("fp_a"),
                 F.sum(b).cast("long").alias("fp_b")))


def changed_partitions(current: DataFrame, previous: DataFrame,
                       part_cols: "list[str]") -> DataFrame:
    """Diff two fingerprint snapshots (both from
    :func:`partition_fingerprints`): one row per partition that needs
    work, with ``status`` 'new' (absent from the previous snapshot),
    'changed' (any of n_rows/fp_a/fp_b moved) or 'deleted' (absent
    from the current one). Unchanged partitions — the overwhelming
    majority of a steady-state corpus — produce no row. Both inputs
    are partitions-sized, so this join is trivial at any corpus
    size."""
    cur = current.select(
        *part_cols, F.struct("n_rows", "fp_a", "fp_b").alias("_cur"))
    prv = previous.select(
        *part_cols, F.struct("n_rows", "fp_a", "fp_b").alias("_prv"))
    j = cur.join(prv, part_cols, "full_outer")
    status = (F.when(F.col("_prv").isNull(), F.lit("new"))
              .when(F.col("_cur").isNull(), F.lit("deleted"))
              .when(F.col("_cur") != F.col("_prv"), F.lit("changed")))
    return (j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(*part_cols, "status"))
