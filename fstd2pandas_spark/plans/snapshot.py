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
slices (< 2^32) summed over up to 2^31 rows per partition stay within
int64 ((2^32 - 1) * 2^31 < 2^63 - 1); beyond that the sum could wrap
SILENTLY under non-ANSI Spark (diverging from DuckDB's HUGEINT), so
the row count carries a config-independent in-plan raise at
:data:`MAX_PARTITION_ROWS` — the loud-guard convention of
``group_linfit``/``group_quantiles_disc``; a partition beyond two
billion rows is mis-partitioned long before the fingerprint wraps.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ASCII unit separator — joins content columns so ("ab","c") and
#: ("a","bc") hash differently
_SEP = "\x1f"

#: NULL content sentinel. A NULL must hash differently from the empty
#: string (a row flipping a column between NULL and '' is a real
#: change), and no real value may ALIAS it: NUL bytes in content are
#: escaped by doubling, and the \\x1f SEPARATOR itself is escaped as
#: NUL + \\x1f (a string column holding a literal \\x1f would
#: otherwise alias a column boundary: ('a\\x1fb','c') and
#: ('a','b\\x1fc') hashed identically, and a real change between them
#: fingerprinted as unchanged — silent-stale-partition class). The
#: joined string parses deterministically left to right (a NUL always
#: starts a 2-char escape, a BARE \\x1f is always a boundary), so the
#: map is injective; a string literally holding '\\x00null' hashes as
#: '\\x00\\x00null' — distinct from NULL's single-NUL sentinel, whose
#: leading NUL can never survive the doubling. DuckDB mirror:
#: ``coalesce(replace(replace(CAST(c AS VARCHAR), chr(0),
#: chr(0) || chr(0)), chr(31), chr(0) || chr(31)), chr(0) || 'null')``
#: — NUL doubling FIRST, then the separator escape, same order as
#: here; chr(0) round-trips replace+md5 identically in both engines
#: (verified against Python hashlib in tests).
_NULL = "\x00null"

#: fingerprint-sum headroom bound (see the module docstring): above
#: 2^31 rows the int64 slice sums lose their no-wrap guarantee, and a
#: non-ANSI wrap would be SILENT — refuse loudly instead.
MAX_PARTITION_ROWS = 2 ** 31


def partition_fingerprints(df: DataFrame, part_cols: "list[str]",
                           content_cols: "list[str]",
                           seed: str = "snap1") -> DataFrame:
    """``(*part_cols, n_rows, fp_a, fp_b)``: per-partition row count
    plus two order-free 64-bit content fingerprint sums (independent
    32-bit md5 slices — a collision must fool both). NULL content
    values hash as a NUL-byte sentinel: distinct from the empty
    string AND from absence (position still separated), identical
    across engines. A partition with more than
    :data:`MAX_PARTITION_ROWS` rows raises in-plan — past that the
    sums could wrap silently under non-ANSI configs."""
    if not part_cols or not content_cols:
        raise ValueError("need at least one partition and content column")
    clash = {"n_rows", "fp_a", "fp_b"} & set(part_cols)
    if clash:
        # the partial_aggregates convention: a part col named like an
        # output yields a duplicate-column frame whose struct packing
        # in changed_partitions reads the WRONG column
        raise ValueError(
            f"partition columns {sorted(clash)} collide with the "
            "fingerprint output names (n_rows/fp_a/fp_b) — rename "
            "them first")
    h = F.md5(F.concat_ws(
        _SEP, F.lit(seed),
        *[F.coalesce(
            F.replace(F.replace(F.col(c).cast("string"),
                                F.lit("\x00"), F.lit("\x00\x00")),
                      F.lit(_SEP), F.lit("\x00" + _SEP)),
            F.lit(_NULL))
          for c in content_cols]))
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    b = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    n = F.count("*").cast("long")
    bad = F.concat(
        F.lit("partition_fingerprints: a partition holds "),
        n.cast("string"),
        F.lit(f" rows > MAX_PARTITION_ROWS={MAX_PARTITION_ROWS} — the "
              "int64 slice sums lose their no-wrap headroom and a "
              "non-ANSI overflow would be silent; repartition the "
              "corpus on a finer key"))
    n_ok = (F.when(n <= F.lit(MAX_PARTITION_ROWS), n)
            .otherwise(F.raise_error(bad).cast("long")))
    return (df.groupBy(*part_cols)
            .agg(n_ok.alias("n_rows"),
                 F.sum(a).cast("long").alias("fp_a"),
                 F.sum(b).cast("long").alias("fp_b")))


def changed_partitions(current: DataFrame, previous: DataFrame,
                       part_cols: "list[str]") -> DataFrame:
    """Diff two fingerprint snapshots (both from
    :func:`partition_fingerprints`): one row per partition that needs
    work, with ``status`` 'new' (absent from the previous snapshot),
    'changed' (any of n_rows/fp_a/fp_b moved) or 'deleted' (absent
    from the current one). Unchanged partitions — the overwhelming
    majority of a steady-state corpus — produce no row. Keys join
    NULL-SAFELY (``<=>``): a NULL partition key — the real-world
    ``__HIVE_DEFAULT_PARTITION__`` — compares like any other value
    instead of matching nothing and misreporting an unchanged
    partition as new+deleted every run. Both inputs are
    partitions-sized, so this join is trivial at any corpus size."""
    if not part_cols:
        raise ValueError(
            "need at least one partition column (the sibling "
            "partition_fingerprints contract)")
    if "status" in part_cols:
        raise ValueError(
            "a partition column named 'status' collides with the "
            "diff's output column — the result frame would hold two "
            "ambiguous 'status' columns; rename it first")
    cur = current.select(
        *[F.col(c).alias(f"_c{i}") for i, c in enumerate(part_cols)],
        F.struct("n_rows", "fp_a", "fp_b").alias("_cur"))
    prv = previous.select(
        *[F.col(c).alias(f"_p{i}") for i, c in enumerate(part_cols)],
        F.struct("n_rows", "fp_a", "fp_b").alias("_prv"))
    cond = functools.reduce(
        lambda x, y: x & y,
        [F.col(f"_c{i}").eqNullSafe(F.col(f"_p{i}"))
         for i in range(len(part_cols))])
    j = cur.join(prv, cond, "full_outer")
    status = (F.when(F.col("_prv").isNull(), F.lit("new"))
              .when(F.col("_cur").isNull(), F.lit("deleted"))
              .when(F.col("_cur") != F.col("_prv"), F.lit("changed")))
    return (j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(*[F.coalesce(F.col(f"_c{i}"), F.col(f"_p{i}"))
                      .alias(c) for i, c in enumerate(part_cols)],
                    "status"))
