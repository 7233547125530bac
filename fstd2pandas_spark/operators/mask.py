"""Mask apply/recover (SURVEY §2.9 G10/G11; reference apply_mask.py,
recover_mask.py).

Masked arrays are represented as NULL elements inside the ``d`` array
(Spark array elements are nullable), which makes apply/recover pure
``zip_with``/``transform`` — no masked-array runtime needed and the
representation survives parquet round-trips.

- ``apply_mask``: pair each '@'-typvar variable row with its mask row
  (typvar == mask_typvar, default '@@') on the 17 shared keys (all BASE
  columns except typvar/datyp/nbits/datev/d — apply_mask.py:56), then NULL
  out elements where the mask says "drop" (keep_value polarity,
  apply_mask.py:71-75). Mask rows are removed from the output.
- ``recover_mask``: the inverse — split each masked-variable row into a
  data row (NULLs replaced by 0) and a uint 0/1 mask row with typvar
  '@@', datyp 2, nbits 1 (recover_mask.py:66-82).

The pairing is a self-join of two *disjoint filters of the same scan* on
exact keys — Spark plans it as one shuffle on the group key (or a
broadcast when one side is small); the 2-rows-per-group assertion becomes
a count check the caller can run (:func:`unpaired_mask_groups`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import BASE_COLUMNS, META_NOMVARS

#: pairing key (apply_mask.py:56)
MASK_GROUP_COLS = [
    c for c in BASE_COLUMNS if c not in ("typvar", "datyp", "nbits", "datev", "d")
]


class MaskError(Exception):
    pass


def _split(df: DataFrame, mask_typvar: str):
    meta = df.filter(F.col("nomvar").isin(META_NOMVARS))
    no_meta = df.filter(~F.col("nomvar").isin(META_NOMVARS))
    masked = no_meta.filter(F.col("typvar").contains("@"))
    not_masked = no_meta.filter(~F.col("typvar").contains("@"))
    return meta, masked, not_masked


def apply_mask(df: DataFrame, mask_typvar: str = "@@",
               keep_value: int = 1) -> DataFrame:
    if len(mask_typvar) != 2:
        raise MaskError(f"mask_typvar has to be 2 characters! provided {mask_typvar}")
    if keep_value not in (0, 1):
        raise MaskError(f"keep_value can only be 0 or 1! provided {keep_value}")

    meta, masked, not_masked = _split(df, mask_typvar)
    vars_ = masked.filter(F.col("typvar") != mask_typvar)
    masks = masked.filter(F.col("typvar") == mask_typvar).select(
        *MASK_GROUP_COLS, F.col("d").alias("_mask_d")
    )
    keep = float(keep_value)
    # MERGE hint: the mask side is one record per data record — corpus-
    # scale — so a stats-driven broadcast would be a driver-OOM plan
    paired = vars_.hint("merge").join(masks, MASK_GROUP_COLS, "inner")
    masked_d = F.zip_with(
        F.col("d"), F.col("_mask_d"),
        lambda v, m: F.when(m == F.lit(keep), v).otherwise(F.lit(None)),
    )
    applied = paired.withColumn("d", masked_d).drop("_mask_d")
    return (
        meta.unionByName(not_masked)
        .unionByName(applied.select(df.columns))
    )


def recover_mask(df: DataFrame, mask_typvar: str = "@@",
                 keep_value: int = 1) -> DataFrame:
    if len(mask_typvar) != 2:
        raise MaskError(f"mask_typvar has to be 2 characters! provided {mask_typvar}")
    if keep_value not in (0, 1):
        raise MaskError(f"keep_value can only be 0 or 1! provided {keep_value}")

    meta, masked, not_masked = _split(df, mask_typvar)
    vars_ = masked.filter(F.col("typvar") != mask_typvar)
    keep = float(keep_value)

    data_rows = vars_.withColumn(
        "d", F.transform(F.col("d"), lambda v: F.coalesce(v, F.lit(0.0).cast("float")))
    )
    mask_rows = (
        vars_.withColumn(
            "d",
            F.transform(
                F.col("d"),
                lambda v: F.when(v.isNotNull(), F.lit(keep))
                .otherwise(F.lit(1.0 - keep)).cast("float"),
            ),
        )
        .withColumn("typvar", F.lit(mask_typvar))
        .withColumn("datyp", F.lit(2))
        .withColumn("nbits", F.lit(1))
    )
    return (
        meta.unionByName(not_masked)
        .unionByName(data_rows.select(df.columns))
        .unionByName(mask_rows.select(df.columns))
    )


def unpaired_mask_groups(df: DataFrame, mask_typvar: str = "@@") -> DataFrame:
    """Validation: masked groups that do not have exactly 2 rows
    (apply_mask.py:62-63's assertion, as a query)."""
    _, masked, _ = _split(df, mask_typvar)
    return (
        masked.groupBy(*MASK_GROUP_COLS).count().filter(F.col("count") != 2)
    )
