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
    field array.

    NaN parity (round-15 review): the reference computes ``np.min`` /
    ``np.argmin`` (dataframe_utils.py:170-179) — NaN POISONS them (one
    NaN makes min/max NaN and argmin/argmax point at the FIRST NaN),
    while Spark's array_min/array_max order NaN above every double (so
    min skipped it and max returned NaN only by accident of the
    ordering). A missing-data field must report the same stats here as
    in the reference, so NaN presence is detected once and min/max/
    positions take the numpy branch. mean/std already agree (the
    arithmetic folds propagate NaN in both engines)."""
    has_nan = F.exists(d, lambda x: F.isnan(x.cast("double")))
    nan_lit = F.lit(float("nan")).cast("double")
    mn = F.when(has_nan, nan_lit).otherwise(F.array_min(d).cast("double"))
    mx = F.when(has_nan, nan_lit).otherwise(F.array_max(d).cast("double"))
    mean = _arr_mean(d)
    # population std via E[x^2] - E[x]^2 (matches np.std)
    ex2 = F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")) / F.size(d)
    std = F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))

    nj = F.floor(F.size(d) / ni).cast("long")

    def _lex_argpos(pred):
        # (i, j) of the matching element FIRST in (i, j)-lexicographic
        # order: np.argmin/argmax flatten the reference's (ni, nj)
        # array C-order — the traversal visits positions in (i, j) lex
        # order (last axis fastest) — so among ties the reference picks
        # the smallest (i, j), while array_position's first-in-flat-
        # storage pick is smallest (j, i) (d is stored ni-fastest).
        # Encoded as ONE long key i0*nj + j0 per matching slot (the lex
        # order linearized) + array_min over longs — a struct-keyed
        # variant measured ~2x slower on the sf0.1 bench (per-element
        # struct boxing); non-matching slots are NULL, which array_min
        # skips.
        keyed = F.transform(
            d, lambda x, p0: F.when(
                pred(x),
                (p0 % ni).cast("long") * nj + F.floor(p0 / ni)))
        k = F.array_min(keyed)
        return F.struct(
            (F.floor(k / nj) + 1).cast("int").alias("i"),
            ((k % nj) + 1).cast("int").alias("j"))

    pmin = F.when(has_nan,
                  _lex_argpos(lambda x: F.isnan(x.cast("double")))) \
        .otherwise(_lex_argpos(lambda x: x == F.array_min(d)))
    pmax = F.when(has_nan,
                  _lex_argpos(lambda x: F.isnan(x.cast("double")))) \
        .otherwise(_lex_argpos(lambda x: x == F.array_max(d)))

    return [
        mn.alias("min"), mx.alias("max"), mean.alias("mean"),
        std.alias("std"), pmin.alias("min_pos"), pmax.alias("max_pos"),
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
