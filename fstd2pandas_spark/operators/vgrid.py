"""Vertical-coordinate classification (SURVEY §2.9 G8 / §2.3 J3;
reference std_vgrid.py:574-646 + dataframe.py:653-673).

Per (grid, ip1_kind) group, compute which meta records exist on that grid
(``!!``, P0, E1, PT, HY, ``!!SF``) plus the set of toctoc vcodes (the
``!!`` rows' ig1), pick the vcode whose thousands digit matches the
ip1_kind when several are present, then classify against the VCTYPES rule
table on the 8 equality keys.

Spark shape: one conditional aggregation over the meta rows per grid
(no loop over groups), then two broadcast joins. The per-group pandas loop
of the reference becomes a single shuffle-light plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import META_NOMVARS
from fstd2pandas_spark.functions.codecs import decode_ip_kind
from fstd2pandas_spark.lookups import vctypes_df


def _meta_flags_per_grid(meta: DataFrame) -> DataFrame:
    """Per-grid existence booleans + vcode list (dataframe.py:653-673)."""
    return meta.groupBy("grid").agg(
        (F.max(F.when(F.col("nomvar") == "!!", 1).otherwise(0)) == 1).alias("toctoc"),
        (F.max(F.when(F.col("nomvar") == "P0", 1).otherwise(0)) == 1).alias("P0"),
        (F.max(F.when(F.col("nomvar") == "E1", 1).otherwise(0)) == 1).alias("E1"),
        (F.max(F.when(F.col("nomvar") == "PT", 1).otherwise(0)) == 1).alias("PT"),
        (F.max(F.when(F.col("nomvar") == "HY", 1).otherwise(0)) == 1).alias("HY"),
        (F.max(F.when(F.col("nomvar") == "!!SF", 1).otherwise(0)) == 1).alias("SF"),
        F.sort_array(
            F.collect_set(F.when(F.col("nomvar") == "!!", F.col("ig1")))
        ).alias("vcodes"),
    )


def meta_fields_exists(df: DataFrame) -> DataFrame:
    """A6 (dataframe.py:653-673): per-grid existence booleans for the
    reserved meta records (toctoc/P0/E1/PT/HY/SF) plus the sorted vcode
    list — one conditional aggregation, no per-group loop."""
    return _meta_flags_per_grid(df.filter(F.col("nomvar").isin(META_NOMVARS)))


def toctoc_from_vgrid(spark, kind: int, version: int,
                      vtbl: "list[list[float]]", ip1: int,
                      ip2: int) -> DataFrame:
    """G9 (reference std_vgrid.py:749-791 ``get_df_from_vgrid``): build the
    one-row ``!!`` record for a vertical-grid descriptor.

    ``ig1 = int(f"{kind}{version:03d}")`` (e.g. kind 5, version 2 ->
    5002). ``vtbl`` is one ``(ip1, A, B)`` triple per level; the record
    stores it as ni=3, nj=nlevels with element (i, j) 1-based at flat
    index ``(j-1)*3 + i`` — the exact convention
    :func:`~fstd2pandas_spark.operators.pressure.quick_pressure` reads
    back (pressure.py:165-176), so G9-built records feed HYBRID_5002-5005
    for any level count, not just nlevels == 3.
    """
    from fstd2pandas_spark.schema import empty_record_table

    nj = len(vtbl)
    ni = 3 if nj else 0
    for row in vtbl:
        if len(row) != 3:
            raise ValueError(
                f"vtbl rows must be (ip1, A, B) triples; got {len(row)} entries")
    flat = [float(x) for row in vtbl for x in row]
    ig1 = int(f"{kind}{version:03d}")
    out = empty_record_table(
        spark, 1, nomvar="!!", typvar="X", etiket="", ni=ni, nj=nj,
        ip1=ip1, ip2=ip2, datyp=5, nbits=64, grtyp="X", ig1=ig1,
    )
    return out.withColumn(
        "d", F.lit(flat).cast("array<float>")
    ).withColumn("grid", F.concat(F.col("ip1").cast("string"),
                                  F.col("ip2").cast("string")))


def set_vertical_coordinate_type(df: DataFrame) -> DataFrame:
    """Add a ``vctype`` column; meta rows get 'UNKNOWN'
    (std_vgrid.py:574-646)."""
    if "vctype" in df.columns:
        return df

    meta = df.filter(F.col("nomvar").isin(META_NOMVARS))
    # NULL nomvar is a data row (pandas ~isin keeps NaN — the select.py
    # rule); bare ~isin dropped it from BOTH halves
    no_meta = df.filter(~F.col("nomvar").isin(META_NOMVARS)
                        | F.col("nomvar").isNull())

    flags = _meta_flags_per_grid(meta)
    with_kind = no_meta.withColumn("ip1_kind", decode_ip_kind(F.col("ip1")))

    # distinct classification requests: (grid, ip1_kind)
    req = with_kind.select("grid", "ip1_kind").distinct()
    req = req.join(F.broadcast(flags), "grid", "left").fillna(
        False, subset=["toctoc", "P0", "E1", "PT", "HY", "SF"]
    )
    # vcode pick: single vcode -> it; several -> the one whose
    # thousands-digit equals ip1_kind, else -1 (std_vgrid.py:601-614)
    vcodes = F.coalesce(F.col("vcodes"), F.array())
    matching = F.filter(vcodes, lambda v: (v / 1000).cast("int") == F.col("ip1_kind"))
    req = req.withColumn(
        "vcode",
        F.when(F.size(vcodes) == 0, F.lit(-1))
        .when(F.size(vcodes) == 1, F.element_at(vcodes, 1))
        .otherwise(F.coalesce(F.try_element_at(matching, F.lit(1)), F.lit(-1))),
    ).drop("vcodes")

    rules = vctypes_df()
    classified = req.join(
        F.broadcast(rules),
        on=["ip1_kind", "toctoc", "P0", "E1", "PT", "HY", "SF", "vcode"],
        how="left",
    ).select(
        "grid", "ip1_kind",
        F.coalesce(F.col("vctype"), F.lit("UNKNOWN")).alias("vctype"),
    )

    data_out = (
        with_kind.join(F.broadcast(classified), ["grid", "ip1_kind"], "left")
        .withColumn("vctype", F.coalesce(F.col("vctype"), F.lit("UNKNOWN")))
        .drop("ip1_kind")
    )
    meta_out = meta.withColumn("vctype", F.lit("UNKNOWN"))
    return data_out.unionByName(meta_out.select(data_out.columns))
