"""Horizontal grid / coordinate layer (SURVEY §2.9 G12-G16).

Reference behavior: std_grid.py:51-109 decodes ``grtyp`` + igs into
projection params (via librmn ``ezqkdef``/``decodeGrid``),
std_grid.py:114-203 emits full 2-D lat/lon arrays as ``LA``/``LO``
records (via ezscint ``gdll``), std_grid.py:208-270 classifies global
grids. Here the projection math is re-derived from the public RPN
standard-file grid-type definitions and expressed as **native Column
expressions** (``sequence``/``transform`` — JVM-side, no UDFs), so
lat/lon generation scales as a narrow map over grids:

- ``A``  global/hemispheric lat-lon, no poles, lon first: lon_i = i*360/ni
- ``B``  lat-lon including poles and a repeated first longitude
- ``G``  Gaussian: latitudes are Gauss-Legendre roots (computed once per
         distinct nj driver-side — a few scalars — then broadcast)
- ``L``  limited-area lat-lon from (lat0, lon0, dlat, dlon)
- ``Z/#`` axes from the ``>>``/``^^`` records (grref ``L``), outer product
- ``Y``  ``>>``/``^^`` already hold full 2-D lon/lat — passthrough
- ``E/N/S/U`` (rotated / polar-stereographic / composite) are declared
  but raise — the rotation/stereographic math is a follow-up.

Array layout: row-major with ``i`` (the ni/longitude axis) fastest —
``flat[k]`` maps to ``i = k % ni``, ``j = k div ni`` (SURVEY §7.3b).

ig packing for ``L`` grids (engine convention, invertible; bit-parity
with librmn cigaxg is future work and irrelevant to the synthetic
container format): ``ig1 = round((lat0+90)*100)``,
``ig2 = round((lon0+180)*100)``, ``ig3 = round(dlat*100)``,
``ig4 = round(dlon*100)``.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import META_NOMVARS

SUPPORTED_GRTYPS = ["A", "B", "G", "L", "Z", "#", "Y"]
DECLARED_GRTYPS = SUPPORTED_GRTYPS + ["E", "N", "S", "U", "X"]


class GridDefinitionError(Exception):
    pass


# --- ig <-> float packing for L grids (engine convention) -------------------

def l_grid_igs(lat0: float, lon0: float, dlat: float, dlon: float) -> tuple:
    """Pack L-grid params into (ig1, ig2, ig3, ig4)."""
    return (int(round((lat0 + 90.0) * 100.0)),
            int(round((lon0 + 180.0) * 100.0)),
            int(round(dlat * 100.0)), int(round(dlon * 100.0)))


def l_lat0(ig1: Column) -> Column:
    return ig1 / 100.0 - 90.0


def l_lon0(ig2: Column) -> Column:
    return ig2 / 100.0 - 180.0


def l_dlat(ig3: Column) -> Column:
    return ig3 / 100.0


def l_dlon(ig4: Column) -> Column:
    return ig4 / 100.0


def gaussian_latitudes(nj: int) -> list[float]:
    """South-to-north Gaussian latitudes (degrees): arcsin of the
    Gauss-Legendre quadrature roots. Driver-side: O(nj) scalars per
    distinct nj, broadcast to executors as literals."""
    roots, _ = np.polynomial.legendre.leggauss(nj)
    return [float(np.degrees(np.arcsin(r))) for r in np.sort(roots)]


# --- per-grtyp 1-D axis expressions (native, row-major i-fastest) -----------

def _axis_lon(grtyp: Column, ni: Column, ig2: Column) -> Column:
    """1-D longitude axis (length ni) for the analytic grid types."""
    i = F.sequence(F.lit(0), ni - 1)
    return (
        F.when(grtyp.isin("A", "G"),
               F.transform(i, lambda k: k * 360.0 / ni))
        .when(grtyp == "B",
              F.transform(i, lambda k: k * 360.0 / (ni - 1)))
        .when(grtyp == "L",
              F.transform(i, lambda k: l_lon0(ig2) + k * l_dlon(F.col("ig4"))))
    )


def _axis_lat(grtyp: Column, nj: Column, ig1: Column,
              gauss: Column | None = None) -> Column:
    """1-D latitude axis (length nj), south to north.

    A-grid hemisphere select by ig1 (0 global, 1 north, 2 south) per the
    public grid-type table; B includes both poles.
    """
    j = F.sequence(F.lit(0), nj - 1)
    a_span = F.when(ig1 == 1, 90.0).when(ig1 == 2, 90.0).otherwise(180.0)
    a_base = F.when(ig1 == 1, 0.0).otherwise(-90.0)
    lat_a = F.transform(j, lambda k: a_base + (k + 0.5) * a_span / nj)
    lat_b = F.transform(j, lambda k: -90.0 + k * 180.0 / (nj - 1))
    lat_l = F.transform(
        j, lambda k: l_lat0(F.col("ig1")) + k * l_dlat(F.col("ig3")))
    out = (
        F.when(grtyp == "A", lat_a)
        .when(grtyp == "B", lat_b)
        .when(grtyp == "L", lat_l)
    )
    if gauss is not None:
        out = F.when(grtyp == "G", gauss).otherwise(out)
    return out


def _expand_2d(axis_x: Column, axis_y: Column, ni: Column, nj: Column):
    """Outer-product a lon axis (ni) and lat axis (nj) to flattened 2-D
    row-major arrays: lon[k] = ax[k % ni], lat[k] = ay[k div ni]."""
    k = F.sequence(F.lit(0), ni * nj - 1)
    lon2d = F.transform(k, lambda x: F.element_at(axis_x, (x % ni + 1).cast("int")))
    lat2d = F.transform(k, lambda x: F.element_at(axis_y, (F.floor(x / ni) + 1).cast("int")))
    return lat2d, lon2d


def grid_lat_lon(df: DataFrame, keep_template_cols: bool = True) -> DataFrame:
    """G12: per (grid), emit ``LA`` (latitudes) and ``LO`` (longitudes)
    records with full flattened 2-D arrays.

    Pipeline shape: one representative non-meta row per grid (window
    first-row, W4) + a broadcast-join of the grid's ``>>``/``^^`` axis
    records for Z/#/Y + per-grtyp native array expressions, then a 2-row
    explode (LA/LO). No Python in the hot path; per-grid work is
    O(ni*nj) array construction inside codegen.
    """
    no_meta = df.filter(~F.col("nomvar").isin(META_NOMVARS))
    unsupported = (
        no_meta.select("grtyp").distinct()
        .filter(~F.col("grtyp").isin(SUPPORTED_GRTYPS))
        .collect()
    )
    if unsupported:
        bad = sorted(r.grtyp for r in unsupported)
        raise GridDefinitionError(
            f"unsupported grid type(s) {bad}; supported: {SUPPORTED_GRTYPS}")

    w = Window.partitionBy("grid").orderBy("nomvar", "ip1", "ip2", "ip3")
    rep = (
        no_meta.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )

    # axis records: >> holds the lon axis (ni x 1), ^^ the lat axis (1 x nj)
    ax = (df.filter(F.col("nomvar") == ">>")
            .select(F.col("grid"), F.col("d").alias("_ax")))
    ay = (df.filter(F.col("nomvar") == "^^")
            .select(F.col("grid"), F.col("d").alias("_ay")))
    rep = (rep.join(F.broadcast(ax), "grid", "left")
              .join(F.broadcast(ay), "grid", "left"))

    # Gaussian latitudes per distinct nj (driver-side scalars, G only)
    g_njs = [r.nj for r in rep.filter(F.col("grtyp") == "G")
             .select("nj").distinct().collect()]
    gauss = None
    if g_njs:
        mapping = F.create_map(*[
            x for nj in g_njs
            for x in (F.lit(nj),
                      F.array(*[F.lit(v) for v in gaussian_latitudes(nj)]))
        ])
        gauss = mapping[F.col("nj")]

    grtyp, ni, nj = F.col("grtyp"), F.col("ni"), F.col("nj")
    axis_x = F.coalesce(_axis_lon(grtyp, ni, F.col("ig2")), F.col("_ax"))
    axis_y = F.coalesce(_axis_lat(grtyp, nj, F.col("ig1"), gauss), F.col("_ay"))
    lat2d, lon2d = _expand_2d(axis_x, axis_y, ni, nj)
    # Y grids: >>/^^ already hold full 2-D lon/lat
    lat2d = F.when(grtyp == "Y", F.col("_ay")).otherwise(lat2d)
    lon2d = F.when(grtyp == "Y", F.col("_ax")).otherwise(lon2d)

    computed = rep.withColumn("_lat", lat2d).withColumn("_lon", lon2d)
    la = computed.withColumn("nomvar", F.lit("LA")) \
                 .withColumn("d", F.col("_lat"))
    lo = computed.withColumn("nomvar", F.lit("LO")) \
                 .withColumn("d", F.col("_lon"))
    out = la.unionByName(lo).drop("_ax", "_ay", "_lat", "_lon")
    if not keep_template_cols:
        out = out.select("grid", "nomvar", "ni", "nj", "grtyp", "d")
    return out


def is_global_grid(df: DataFrame, epsilon: float = 0.001) -> DataFrame:
    """G14: per grid, (global_grid, repetition) flags following the
    reference's rules (std_grid.py:208-270): A/G global; B global with
    repeated longitude; Z global iff first lon == last lon (eps); L by
    dlon coverage arithmetic."""
    lo = grid_lat_lon(df).filter(F.col("nomvar") == "LO").select(
        "grid", "grtyp", "ni", "ig4", F.col("d").alias("_lon"))
    first = F.element_at("_lon", 1)
    last = F.element_at("_lon", F.size("_lon"))
    z_rep = F.abs(first - last) <= epsilon
    dlon = l_dlon(F.col("ig4"))
    nb = F.col("ni") * dlon
    l_exact = F.abs(F.pmod(F.lit(360.0), dlon)) < 1e-12
    covers = nb >= 360.0 - epsilon
    # non-exact dlon (std_grid.py:247-258): case 2 (wraps but the repeated
    # point's longitude differs -> repetition only, NOT global) is checked
    # before case 3 (wraps, last point strictly below 360 -> global)
    case2 = covers & (last <= (nb + dlon) - 360.0 + epsilon)
    case3 = covers & (last < 360.0) & (F.abs(last - 360.0) > epsilon)
    l_global = F.when(
        l_exact,
        (F.abs(nb - 360.0) <= epsilon)
        | (F.abs(nb - (360.0 + dlon)) <= epsilon),
    ).otherwise(~case2 & case3)
    l_rep = F.when(l_exact, F.abs(nb - (360.0 + dlon)) <= epsilon) \
             .otherwise(case2)
    return lo.select(
        "grid", "grtyp",
        F.when(F.col("grtyp").isin("A", "G"), F.lit(True))
         .when(F.col("grtyp") == "B", F.lit(True))
         .when(F.col("grtyp") == "Z", z_rep)
         .when(F.col("grtyp") == "L", l_global)
         .otherwise(F.lit(False)).alias("global_grid"),
        F.when(F.col("grtyp") == "B", F.lit(True))
         .when(F.col("grtyp") == "Z", z_rep)
         .when(F.col("grtyp") == "L", l_rep)
         .otherwise(F.lit(False)).alias("repetition"),
    )


def df_from_grid(spark, grid_params: dict) -> DataFrame:
    """G15 (std_grid.py:13-44): build ``>>``/``^^`` axis records from a
    grid-params dict (keys: grtyp in Z/Y, ni, nj, ig1, ig2, grref,
    ig1ref..ig4ref, ax, ay)."""
    g = grid_params
    if g.get("grtyp") not in ("Z", "Y"):
        raise GridDefinitionError("df_from_grid supports Z and Y grids")
    base = dict(
        typvar="X", etiket="", nk=1, dateo=0, ip1=int(g["ig1"]),
        ip2=int(g["ig2"]), ip3=0, deet=0, npas=0, datyp=5, nbits=32,
        grtyp=g.get("grref", "L"), ig1=int(g.get("ig1ref", 0)),
        ig2=int(g.get("ig2ref", 0)), ig3=int(g.get("ig3ref", 0)),
        ig4=int(g.get("ig4ref", 0)), datev=0,
        grid=f"{int(g['ig1'])}{int(g['ig2'])}",
    )
    rows = [
        dict(base, nomvar=">>", ni=int(g["ni"]), nj=1,
             d=[float(x) for x in g["ax"]]),
        dict(base, nomvar="^^", ni=1, nj=int(g["nj"]),
             d=[float(x) for x in g["ay"]]),
    ]
    schema = ("nomvar string, typvar string, etiket string, ni int, nj int, "
              "nk int, dateo bigint, ip1 int, ip2 int, ip3 int, deet int, "
              "npas int, datyp int, nbits int, grtyp string, ig1 int, "
              "ig2 int, ig3 int, ig4 int, datev bigint, grid string, "
              "d array<float>")
    return spark.createDataFrame(rows, schema=schema)


def grid_metadata_for(df: DataFrame, source: DataFrame) -> DataFrame:
    """G16 (std_io.py:159-213): meta records in ``source`` tied to the
    grids present in ``df`` — a left-semi join on grid."""
    grids = df.select("grid").distinct()
    return (
        source.filter(F.col("nomvar").isin(META_NOMVARS))
        .join(F.broadcast(grids), "grid", "leftsemi")
    )
