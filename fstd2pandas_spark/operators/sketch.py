"""Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
heavy-hitter / frequency sketch, engine-determinism-first.

At 100 TB exact per-key counts of a high-cardinality column (URLs,
tokens, user agents) need a shuffle keyed by that column; a Count-Min
sketch needs ONE map-side-combinable aggregation into depth x width
integer counters — kilobytes of state regardless of key cardinality —
and sketches from different partitions/days/streams MERGE by plain
addition. Estimates overcount only (min over depth rows bounds the
collision error), never undercount.

Determinism contract (what makes this oracle-gatable where probabilistic
sketch libraries are not): bucket hashes are md5-derived
(``cms{d}_{value}``), counters are integer sums — both
summation-order-free and bit-identical on any engine, partitioning, or
merge order. An SQL oracle rebuilds the exact counter matrix and the
exact estimates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket_col(value: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket of a value: first 8 md5 hex digits of
    ``cms{d}_{value}`` mod ``width``."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"cms{d}_"), value.cast("string"))), 1, 8),
        16, 10).cast("long") % width)


def countmin_counters(df: DataFrame, key_col: str, width: int = 1024,
                      depth: int = 4,
                      weight_col: "str | None" = None) -> DataFrame:
    """Build the sketch: (d, bucket, c) rows — the non-zero cells of
    the depth x width counter matrix. ONE aggregation, map-side
    combined, output bounded by depth*width regardless of key
    cardinality. ``weight_col`` counts weighted occurrences (e.g.
    bytes per URL) instead of rows."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    rows = df.select(
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     cms_bucket_col(F.col(key_col), d, width)
                     .alias("bucket"))
            for d in range(depth)])).alias("db"),
        w.alias("_w"))
    return (rows.groupBy("db.d", "db.bucket")
            .agg(F.sum("_w").alias("c")))


def merge_counters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth): cells add
    — the property that lets per-day / per-stream sketches combine
    without touching raw data."""
    return (a.unionByName(b).groupBy("d", "bucket")
            .agg(F.sum("c").alias("c")))


def countmin_estimate(counters: DataFrame, keys: DataFrame,
                      key_col: str, width: int, depth: int) -> DataFrame:
    """Estimated count for every row of ``keys``: min over the depth
    rows of the key's counter cells (missing cells are 0). The counter
    side is depth*width-bounded, so it broadcasts; the keys side
    streams — estimating a billion keys is a narrow broadcast join."""
    banded = keys.select(
        F.col(key_col),
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     cms_bucket_col(F.col(key_col), d, width)
                     .alias("bucket"))
            for d in range(depth)])).alias("db"))
    joined = banded.join(
        F.broadcast(counters),
        (banded["db.d"] == counters["d"])
        & (banded["db.bucket"] == counters["bucket"]), "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .cast("long").alias("cms_est")))
