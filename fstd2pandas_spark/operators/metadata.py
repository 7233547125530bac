"""Metadata association + cleanup — the flagship multi-join pipeline
(SURVEY §2.4; reference dataframe_utils.py:67-110 and helpers 186-459).

``metadata_cleanup`` recomputes which descriptor records (``>>``, ``^^``,
``^>``, ``P0``, ``PT``, ``HY``, ``!!``) are *actually referenced* by the
data rows and drops the rest:

- grid-deformation fields resolve per (grid, dateo, datev, deet, npas)
  group with a 3-tier fallback strictness (very-strict: +dateo+deet+npas;
  strict: +dateo; loose: grid only) — dataframe_utils.py:335-392. Here the
  fallback is a specificity-ranked join: candidates join on grid, a match
  tier is computed per row, and a window keeps only candidates at each
  group's best tier.
- P0 picks rows matching hybrid/sigma grids AND the group's (ni, nj)
  (dataframe_utils.py:394-432); PT the same for sigma grids (434-459).
- HY survives only if hybrid levels exist (322-332).
- ``!!`` rows must match grid AND their ig1 (the vcode) must belong to the
  level family present on that grid: hybrid {1003, 5001-5005, 5100, 5999,
  21001, 21002}, sigma {1001, 1002}, pressure {2001}
  (dataframe_utils.py:232-300).

All joins are against *distinct grid/group frames* (tiny at any scale:
#grids ~ dozens even at 100 TB), so every join here broadcasts; no
full-data shuffle occurs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import META_NOMVARS
from fstd2pandas_spark.functions.codecs import decode_ip_kind
from fstd2pandas_spark.functions.meta import grid_identifier

#: 19-col meta dedup subset (dataframe_utils.py:296-297 etc.)
META_DEDUP_SUBSET = [
    "grtyp", "nomvar", "typvar", "ni", "nj", "nk", "ip1", "ip2", "ip3",
    "deet", "npas", "nbits", "ig1", "ig2", "ig3", "ig4", "datev", "dateo",
    "datyp",
]

#: 16-col deformation-field subset (dataframe_utils.py:336)
DEFORMATION_SUBSET = [
    "nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo", "ip1", "ip2",
    "ip3", "deet", "npas", "ig1", "ig2", "ig3", "ig4",
]

HYBRID_VCODES = [1003, 5001, 5002, 5003, 5004, 5005, 5100, 5999, 21001, 21002]
SIGMA_VCODES = [1001, 1002]
PRESSURE_VCODES = [2001]


def add_grid_column(df: DataFrame) -> DataFrame:
    """Derive the grid identifier column (dataframe.py:20-46)."""
    return df.withColumn(
        "grid",
        grid_identifier(F.col("nomvar"), F.col("ip1"), F.col("ip2"),
                        F.col("ig1"), F.col("ig2")),
    )


def _grid_deformation_fields(df: DataFrame, groups: DataFrame) -> DataFrame:
    """J5 — the 3-tier fallback join as a specificity-ranked window.
    ``groups`` is the distinct (grid, dateo, datev, deet, npas) frame
    (one row per deformation group, from :func:`_group_profile`)."""
    groups = groups.select("grid", "dateo", "datev", "deet", "npas")
    cands = df.filter(F.col("nomvar").isin(">>", "^^", "^>"))

    g = groups.select(
        F.col("grid").alias("_grid"), F.col("dateo").alias("_dateo"),
        F.col("datev").alias("_datev"), F.col("deet").alias("_deet"),
        F.col("npas").alias("_npas"),
    )
    joined = cands.join(F.broadcast(g), cands["grid"] == g["_grid"], "inner")
    tier = (
        F.when((F.col("dateo") == F.col("_dateo"))
               & (F.col("deet") == F.col("_deet"))
               & (F.col("npas") == F.col("_npas")), 3)
        .when(F.col("dateo") == F.col("_dateo"), 2)
        .otherwise(1)
    )
    joined = joined.withColumn("_tier", tier)
    grp_keys = ["_grid", "_dateo", "_datev", "_deet", "_npas", "nomvar"]
    best = Window.partitionBy(*grp_keys)
    joined = (
        joined.withColumn("_best", F.max("_tier").over(best))
        .filter(F.col("_tier") == F.col("_best"))
    )
    # per-tier dedup inside each group (the reference shrinks the dedup
    # subset as the match loosens: strict drops deet+npas, loose also dateo)
    sub3 = DEFORMATION_SUBSET
    sub2 = [c for c in sub3 if c not in ("deet", "npas")]
    sub1 = [c for c in sub2 if c != "dateo"]
    parts = []
    for t, sub in ((3, sub3), (2, sub2), (1, sub1)):
        w = Window.partitionBy(*grp_keys, *sub).orderBy(F.col("key").asc_nulls_last())
        parts.append(
            joined.filter(F.col("_tier") == t)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return out.select(df.columns).dropDuplicates(DEFORMATION_SUBSET)


def _group_profile(no_meta: DataFrame) -> DataFrame:
    """ONE aggregation pass over the data rows serving every survival
    rule, at the deformation-group granularity (grid, dateo, datev, deet,
    npas): representative (ni, nj) minima and the set of ip1 kinds.

    Both the deformation group list and the per-grid profile re-aggregate
    from this frame, so the whole cleanup carries a single scan +
    exchange of the data rows and Spark's ReusedExchange serves all
    consumers — instead of one full pass per rule (5+ scans at 100 TB).
    """
    return (
        no_meta.withColumn("_k", decode_ip_kind(F.col("ip1")))
        .groupBy("grid", "dateo", "datev", "deet", "npas").agg(
            F.min("ni").alias("ni"), F.min("nj").alias("nj"),
            F.collect_set("_k").alias("kinds"),
        )
    )


def _grid_profile(groups: DataFrame) -> DataFrame:
    """Per-grid roll-up of :func:`_group_profile`: the representative
    (ni, nj) (dataframe_utils.py:402-423 takes ``unique()[0]`` — an
    arbitrary representative; we pick min() so the choice is
    deterministic) and the union of ip1 kinds. Input is already tiny
    (one row per deformation group), so this re-aggregation is free."""
    return groups.groupBy("grid").agg(
        F.min("ni").alias("ni"), F.min("nj").alias("nj"),
        F.array_distinct(F.flatten(F.collect_set("kinds"))).alias("kinds"),
    )


def _family_grids(profile: DataFrame, kinds: list[int]) -> DataFrame:
    """Distinct grids having any level of the given ip1 kinds."""
    karr = F.array(*[F.lit(k) for k in kinds])
    return profile.filter(F.arrays_overlap("kinds", karr)).select("grid")


def _surface_fields(df: DataFrame, profile: DataFrame, nomvar: str,
                    kinds: list[int]) -> DataFrame:
    """P0/PT selection: meta rows of `nomvar` matching a family grid AND
    that grid's representative (ni, nj).

    DELIBERATE DEVIATION from the reference: get_p0_fields/get_pt_fields
    (std_writer.py) derive the grid set from the FIRST row of each
    matching ip1 (`.iloc[0]`), so a file where one hybrid/sigma ip1
    appears on several grids keeps P0/PT for only one of them. Keeping
    every family grid (this implementation) is more complete and
    order-independent — a per-ip1 "first row" is not well-defined under
    distributed execution (same class of choice as the min(ni, nj)
    representative)."""
    karr = F.array(*[F.lit(k) for k in kinds])
    dims = profile.filter(F.arrays_overlap("kinds", karr)) \
        .select("grid", "ni", "nj")
    sel = df.filter(F.col("nomvar") == nomvar).join(
        F.broadcast(dims), ["grid", "ni", "nj"], "leftsemi"
    )
    return sel.dropDuplicates(META_DEDUP_SUBSET)


def _hy_field(df: DataFrame, profile: DataFrame) -> DataFrame:
    """HY survives only if hybrid (kind 5) levels exist anywhere."""
    hybrid_any = (
        profile.filter(F.array_contains("kinds", F.lit(5)))
        .select(F.lit(1).alias("_x")).limit(1)
    )
    return (
        df.filter(F.col("nomvar") == "HY")
        .crossJoin(F.broadcast(hybrid_any)).drop("_x")
        .dropDuplicates(META_DEDUP_SUBSET)
    )


def _toctoc_fields(df: DataFrame, profile: DataFrame) -> DataFrame:
    """``!!`` rows kept when their grid carries the matching level family
    and ig1 is in that family's vcode set."""
    toctoc = df.filter(F.col("nomvar") == "!!")
    parts = []
    for kinds, vcodes in (([5], HYBRID_VCODES), ([1], SIGMA_VCODES),
                          ([2], PRESSURE_VCODES)):
        grids = _family_grids(profile, kinds)
        parts.append(
            toctoc.filter(F.col("ig1").isin(vcodes))
            .join(F.broadcast(grids), "grid", "leftsemi")
        )
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return out.dropDuplicates(META_DEDUP_SUBSET)


def metadata_cleanup(df: DataFrame, strict_toctoc: bool = True) -> DataFrame:
    """Drop descriptor records not referenced by any data row
    (dataframe_utils.py:67-110). Returns data rows + the surviving meta
    rows (column set unchanged)."""
    # NULL nomvar is a data row (pandas ~isin keeps NaN — the select.py
    # rule); bare ~isin silently dropped it from the cleanup output
    no_meta = df.filter(~F.col("nomvar").isin(META_NOMVARS)
                        | F.col("nomvar").isNull())
    groups = _group_profile(no_meta)
    profile = _grid_profile(groups)
    deformation = _grid_deformation_fields(df, groups)
    p0 = _surface_fields(df, profile, "P0", kinds=[5, 1])
    pt = _surface_fields(df, profile, "PT", kinds=[1])
    hy = _hy_field(df, profile)
    toctoc = _toctoc_fields(df, profile)
    out = deformation
    for part in (p0, pt, hy, toctoc, no_meta):
        out = out.unionByName(part.select(df.columns))
    return out
