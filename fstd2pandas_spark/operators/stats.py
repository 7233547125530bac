"""Per-record statistics + voir display (SURVEY §2.5 A1, §2.6 W1;
reference dataframe_utils.py:117-182).

``fststat`` computes per-row min / max / mean / std (population) and the
1-based (i, j) positions of the first min/max over the flattened field.

Array-position convention: ``d`` is stored flat with ``ni`` fastest
(element (i, j), 1-based, at index (j-1)*ni + (i-1)); min_pos/max_pos
report ``(i, j)`` like the reference's ``np.unravel_index`` over (ni, nj)
(dataframe_utils.py:170-179), with i varying fastest.

Everything is higher-order array functions on the JVM — no UDFs, no
shuffle: a pure map over records.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.codecs import decode_ip_value


def _arr_mean(d: Column) -> Column:
    return F.aggregate(
        d, F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    ) / F.size(d)


def array_stats_columns(d: Column, ni: Column) -> list[Column]:
    """min, max, mean, std, min_pos, max_pos expression list for a flat
    field array."""
    mn = F.array_min(d).cast("double")
    mx = F.array_max(d).cast("double")
    mean = _arr_mean(d)
    # population std via E[x^2] - E[x]^2 (matches np.std)
    ex2 = F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")) / F.size(d)
    std = F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))
    pmin = F.array_position(d, F.array_min(d))   # 1-based flat index
    pmax = F.array_position(d, F.array_max(d))

    def _pos(p):
        return F.struct(
            ((p - 1) % ni + 1).cast("int").alias("i"),
            ((p - 1) / ni + 1).cast("int").alias("j"),
        )

    return [
        mn.alias("min"), mx.alias("max"), mean.alias("mean"),
        std.alias("std"), _pos(pmin).alias("min_pos"), _pos(pmax).alias("max_pos"),
    ]


def fststat(df: DataFrame) -> DataFrame:
    """Summary statistics per record (dataframe_utils.py:147-182).

    Returns the id columns + stats; show()/collect() at the caller's
    discretion (the reference prints)."""
    return df.select(
        "nomvar", "typvar",
        decode_ip_value(F.col("ip1")).cast("float").alias("level"),
        "ip1", "ip2", "ip3", "dateo", "etiket",
        *array_stats_columns(F.col("d"), F.col("ni")),
    )


def voir(df: DataFrame) -> DataFrame:
    """Record listing in the rpn `voir` order: nomvar asc, level desc
    (dataframe_utils.py:117-140)."""
    return (
        df.withColumn("level", decode_ip_value(F.col("ip1")).cast("float"))
        .select("nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo",
                "ip1", "ip2", "ip3", "deet", "npas", "datyp", "nbits",
                "grtyp", "ig1", "ig2", "ig3", "ig4", "level")
        .orderBy(F.col("nomvar").asc(), F.col("level").desc())
    )
