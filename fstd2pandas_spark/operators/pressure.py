"""QuickPressure — derive PX/PXSA pressure records per level
(SURVEY §2.9 G1-G7; reference quick_pressure.py:18-83, std_vgrid.py:180-545).

For each (grid, vctype, datev) group of data rows, emit one ``PX`` record
per distinct level, with the pressure as a 2-D field derived from the
grid's surface-pressure/coordinate descriptors:

- SIGMA_1001:    pres = level * P0                      (std_vgrid.py:338-343)
- ETA_1002:      pres = level * (P0 - PT) + PT          (std_vgrid.py:368-374)
- PRESSURE_2001: pres = const(level)                    (std_vgrid.py:388-422)
- HYBRID_5001:   etatop = ptop/pref (HY: ptop=d[0], pref=ig1, rcoef=ig2/1000)
                 B = ((lvl - etatop)/(1 - etatop))^rcoef; A = pref*(lvl - B)
                 pres = A + B * P0                      (std_vgrid.py:437-460)
- HYBRID_5002-5005 (toctoc): per-ip1 (A, B) from the ``!!`` table
                 (row 0 = ip1, row 1 = A, row 2 = B; pref = A[1])
                 pres = exp(A + B*ln(P0*100/pref))/100  (std_vgrid.py:278-300)

``standard_atmosphere=True`` emits ``PXSA`` with P0 replaced by 1013.25
(std_vgrid.py:298-310,345-351,376-383,463-476).

Spark shape: the per-level coefficient math runs on a *levels frame*
(distinct (grid, datev, vctype, ip1) — tiny) computed by ONE window over
the data rows, then four broadcast LEFT joins (P0, PT, ``!!`` triples,
HY) and a per-row CASE choosing the family's arithmetic — a single-pass
plan with no per-family subtree duplication. The only big-data operation
is one ``transform``/``zip_with`` per emitted record. No Python and no
driver-side actions in the data path.

Output matches the reference's ``compute``: PX records + the input's meta
records (quick_pressure.py:79-83); the original data rows are not echoed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import META_NOMVARS
from fstd2pandas_spark.functions.codecs import decode_ip_value
from fstd2pandas_spark.operators.vgrid import set_vertical_coordinate_type

STANDARD_ATMOSPHERE = 1013.25

_EXCLUDED = ["!!", "HY", "P0", "PT", ">>", "^^", "PX", "PXSA"]


def _first_meta(df: DataFrame, nomvar: str, keys: list[str],
                prefix: str) -> DataFrame:
    """First record of `nomvar` per key set, renamed with a prefix.

    With no keys the window is intentionally global — it only ever sees
    the handful of rows surviving the nomvar filter (HY is a per-file
    singleton), so the single partition is bounded, not a scale hazard.
    """
    parts = [F.col(k) for k in keys] if keys else [F.lit(1)]
    w = Window.partitionBy(*parts).orderBy(F.col("key").asc_nulls_last(),
                                           F.col("datev").asc())
    sel = (
        df.filter(F.col("nomvar") == nomvar)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    cols = [F.col(k) for k in keys]
    cols += [F.col("d").alias(f"{prefix}_d"), F.col("nbits").alias(f"{prefix}_nbits"),
             F.col("datyp").alias(f"{prefix}_datyp"), F.col("ig1").alias(f"{prefix}_ig1"),
             F.col("ig2").alias(f"{prefix}_ig2")]
    return sel.select(*cols)


def quick_pressure(df: DataFrame,
                   standard_atmosphere: "bool | str" = False) -> DataFrame:
    """Emit PX (or PXSA) records for every level of every classified
    vertical-coordinate group, plus the input meta records.

    ``standard_atmosphere="both"`` emits PX and PXSA from ONE pass: the
    levels frame explodes over both modes, so callers needing both
    outputs pay one window + one join pipeline instead of two."""
    both = standard_atmosphere == "both"
    df = set_vertical_coordinate_type(df)
    meta = df.filter(F.col("nomvar").isin(META_NOMVARS)).drop("vctype")

    base = df.filter(
        (~F.col("nomvar").isin(_EXCLUDED + META_NOMVARS))
        & (F.col("ip1") != 0)
        & (F.col("vctype") != "UNKNOWN")
    )

    # one container row per (grid, datev, vctype, ip1): metadata template
    # from the group's first row (std_vgrid.py:214-240)
    w = Window.partitionBy("grid", "datev", "vctype", "ip1").orderBy(
        F.col("key").asc_nulls_last(), F.col("nomvar").asc()
    )
    levels = (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "d")
        .withColumn("level", decode_ip_value(F.col("ip1")))
    )

    p0 = _first_meta(df, "P0", ["grid"], "p0")
    pt = _first_meta(df, "PT", ["grid"], "pt")
    hy = _first_meta(df, "HY", [], "hy")

    lvl = F.col("level").cast("double")
    sa = F.lit(STANDARD_ATMOSPHERE)
    vct = F.col("vctype")

    # --- HYBRID_5002-5005: exp(A + B*ln(P0*100/pref))/100 via !! table ----
    # NOTE: ip1 values inside the ``!!`` table ride in the float32 ``d``
    # array; new-style ip1s (< 2^27) sit on a <=8 ULP grid and the common
    # level encodings are exactly representable — cast back via rounding.
    toctoc = df.filter(F.col("nomvar") == "!!")
    # explode the (3 x nlevels) table: element (i,j) 1-based flat (j-1)*ni+i
    tt = toctoc.select(
        F.col("grid").alias("tt_grid"),
        F.col("ig1").alias("tt_vcode"),
        F.element_at("d", 5).cast("double").alias("tt_pref"),  # A[1] = (i=2, j=2)
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("nj")),
                lambda j: F.struct(
                    F.round(F.element_at("d", ((j - 1) * F.col("ni") + 1).cast("int"))).cast("int").alias("tt_ip1"),
                    F.element_at("d", ((j - 1) * F.col("ni") + 2).cast("int")).cast("double").alias("tt_a"),
                    F.element_at("d", ((j - 1) * F.col("ni") + 3).cast("int")).cast("double").alias("tt_b"),
                ),
            )
        ).alias("_tt"),
    ).select("tt_grid", "tt_vcode", "tt_pref", "_tt.*")

    # --- single-pass join pipeline ----------------------------------------
    # ONE windowed levels frame + four broadcast LEFT joins + per-row CASE
    # arithmetic. The per-vctype union of earlier versions duplicated the
    # base scan + window subtree once per family (6x at plan level); here
    # every family reads the same exchange. HY attaches via a 1-row
    # broadcast NLJ on lit(true): an empty HY frame yields nulls (the
    # 5001 rows then drop in the eligibility filter) without any
    # driver-side existence probe.
    lv = (
        levels
        .withColumn("_vcode",
                    F.regexp_extract("vctype", r"(\d+)$", 1).try_cast("int"))
        .join(F.broadcast(p0), "grid", "left")
        .join(F.broadcast(pt), "grid", "left")
        .join(
            F.broadcast(tt),
            on=(F.col("ip1") == F.col("tt_ip1"))
            & (F.col("grid") == F.col("tt_grid"))
            & (F.col("_vcode") == F.col("tt_vcode")),
            how="left",
        )
        .join(F.broadcast(hy), on=F.lit(True), how="left")
    )

    if both:
        lv = lv.withColumn(
            "_sa", F.explode(F.array(F.lit(False), F.lit(True))))
        sa_mode = F.col("_sa")
    else:
        sa_mode = F.lit(bool(standard_atmosphere))

    is_toc = vct.isin("HYBRID_5002", "HYBRID_5003", "HYBRID_5004",
                      "HYBRID_5005")
    has_p0 = F.col("p0_d").isNotNull()
    eligible = (
        ((vct == "SIGMA_1001") & has_p0)
        | ((vct == "ETA_1002") & has_p0 & F.col("pt_d").isNotNull())
        | (vct == "PRESSURE_2001")
        | ((vct == "HYBRID_5001") & has_p0 & F.col("hy_d").isNotNull())
        | (is_toc & has_p0 & F.col("tt_ip1").isNotNull())
    )

    # HYBRID_5001 coefficients (HY: ptop = d[0], pref = ig1, rcoef = ig2/1000)
    ptop = F.element_at(F.col("hy_d"), 1).cast("double")
    pref = F.col("hy_ig1").cast("double")
    rcoef = F.col("hy_ig2").cast("double") / 1000.0
    etatop = ptop / pref
    bcoef = F.pow((lvl - etatop) / (1.0 - etatop), rcoef)
    acoef = pref * (lvl - bcoef)
    cell = F.col("ni") * F.col("nj")

    term = F.pow(
        F.greatest(lvl - etatop, F.lit(0.0)) / (1.0 - etatop), rcoef)
    d_sa = (
        F.when(vct == "SIGMA_1001",
               F.array_repeat((sa * lvl).cast("float"), cell))
        .when(vct == "ETA_1002", F.transform(
            F.col("pt_d"),
            lambda ptv: (ptv.cast("double") * (1.0 - lvl) + lvl * sa)
            .cast("float")))
        .when(vct == "PRESSURE_2001",
              F.array_repeat(lvl.cast("float"), cell))
        .when(vct == "HYBRID_5001", F.array_repeat(
            (pref * (lvl - term) + term * sa).cast("float"), cell))
        .otherwise(F.array_repeat(
            (F.exp(F.col("tt_a") + F.col("tt_b")
                   * F.log(sa * 100.0 / F.col("tt_pref"))) / 100.0)
            .cast("float"), cell))
    )
    d_px = (
        F.when(vct == "SIGMA_1001", F.transform(
            F.col("p0_d"),
            lambda x: (lvl * x.cast("double")).cast("float")))
        .when(vct == "ETA_1002", F.zip_with(
            F.col("p0_d"), F.col("pt_d"),
            lambda a, b: (lvl * (a.cast("double") - b.cast("double"))
                          + b.cast("double")).cast("float")))
        .when(vct == "PRESSURE_2001",
              F.array_repeat(lvl.cast("float"), cell))
        .when(vct == "HYBRID_5001", F.transform(
            F.col("p0_d"),
            lambda x: (acoef + bcoef * x.cast("double")).cast("float")))
        .otherwise(F.transform(
            F.col("p0_d"),
            lambda x: (F.exp(F.col("tt_a") + F.col("tt_b")
                             * F.log(x.cast("double") * 100.0
                                     / F.col("tt_pref"))) / 100.0)
            .cast("float")))
    )

    is_2001 = vct == "PRESSURE_2001"
    out = (
        lv.filter(eligible)
        .withColumn("d", F.when(sa_mode, d_sa).otherwise(d_px))
        .withColumn("nomvar",
                    F.when(sa_mode, F.lit("PXSA")).otherwise(F.lit("PX")))
        .withColumn("etiket", F.lit("PRESSR"))
        .withColumn("nbits", F.when(is_2001, F.lit(32))
                    .otherwise(F.col("p0_nbits")).cast("int"))
        .withColumn("datyp", F.when(is_2001, F.lit(5))
                    .otherwise(F.col("p0_datyp")).cast("int"))
        .select(*[c for c in df.columns if c != "vctype"])
    )
    return out.unionByName(meta.select(out.columns))
