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
- ``E/N/S/U`` rotated lat-lon, polar stereographic (both poles) and
  composite (Yin-Yang) — all implemented below (see the ``E`` and
  ``N/S`` notes at the end of this docstring and ``U`` packing above);
  only ``X`` is skipped with a warning, matching the reference.

Array layout: row-major with ``i`` (the ni/longitude axis) fastest —
``flat[k]`` maps to ``i = k % ni``, ``j = k div ni`` (SURVEY §7.3b).

ig packing — ENGINE CONVENTION boundary (cf. the librmn-compression
boundary, README): the float->ig packings below are this engine's own
invertible fixed-point encodings, NOT bit-parity with librmn
``cigaxg``/``cxgaig``. Parity cannot be VERIFIED in this build
environment (no librmn, no rpnpy, no network copy of the Fortran
source), and an unverifiable from-memory reimplementation would be a
silent wrong-coordinates bug on real files — strictly worse than an
explicit boundary. The packing is therefore isolated behind ONE
encode/decode helper pair per grtyp (``l_grid_igs``/``l_lat0``-family,
``ps_grid_igs``, ``e_grid_igs``): closing the gap against the public
librmn source is a swap of those functions only, with the existing
round-trip property tests (tests/test_grid.py) re-targeted at the
published tables. Grids carrying explicit axis records (Z/#/Y/U — the
dominant real-world layouts) bypass ig packing entirely and are
unaffected. Current encodings:

- ``L``:   ig1 = round((lat0+90)*100), ig2 = round((lon0+180)*100),
           ig3 = round(dlat*100), ig4 = round(dlon*100)
- ``N/S``: ig1 = round(pi*100), ig2 = round(pj*100),
           ig3 = round(d60/100) [m], ig4 = round(dgrw*100)
- ``E``:   ig1 = round((xlat1+90)*100), ig2 = round(xlon1*100),
           ig3 = round((xlat2+90)*100), ig4 = round(xlon2*100)

``U`` (composite, e.g. Yin-Yang): two lat-lon subgrids packed in the
``^>`` record. Engine payload convention (the reference's ``^>`` is an
opaque librmn blob, std_grid.py:35-42):
``[nsub=2, ni1, nj1, ni2, nj2, ax1(ni1), ay1(nj1), ax2(ni2), ay2(nj2)]``;
the composite field is the two subgrids' rows concatenated
(lat/lon = concat along j, std_grid.py:139-143), so the LA/LO records
have ni = ni1 and nj = nj1 + nj2.

``E`` (rotated lat-lon): the grid is globally uniform in a rotated
frame whose equator passes through (xlat1, xlon1) — mapped to rotated
(0, 0) — and (xlat2, xlon2) east of it; rows/cols follow the ``A``
convention in rotated coordinates. ``N``/``S`` (polar stereographic,
true at 60°): cell (i, j) sits at x = (i+1-pi)*d60, y = (j+1-pj)*d60
from the pole; r = |(x, y)| inverts through
lat = ±(90 - 2*atan(r / (Re*(1+sin 60°)))), lon = dgrw ± atan2(y, x).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fstd2pandas_spark.schema import META_NOMVARS

SUPPORTED_GRTYPS = ["A", "B", "G", "L", "Z", "#", "Y", "E", "N", "S", "U"]
DECLARED_GRTYPS = SUPPORTED_GRTYPS + ["X"]

#: mean Earth radius (m), the ezscint convention
EARTH_RADIUS_M = 6_371_000.0


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


def ps_grid_igs(pi: float, pj: float, d60: float, dgrw: float) -> tuple:
    """Pack N/S polar-stereographic params into igs (engine convention)."""
    return (int(round(pi * 100.0)), int(round(pj * 100.0)),
            int(round(d60 / 100.0)), int(round(dgrw * 100.0)))


def e_grid_igs(xlat1: float, xlon1: float, xlat2: float, xlon2: float) -> tuple:
    """Pack E rotated-lat-lon reference points into igs."""
    return (int(round((xlat1 + 90.0) * 100.0)),
            int(round((xlon1 % 360.0) * 100.0)),
            int(round((xlat2 + 90.0) * 100.0)),
            int(round((xlon2 % 360.0) * 100.0)))


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


def _ps_latlon(ni: Column, nj: Column, south: bool):
    """N/S polar-stereographic per-cell (lat, lon) flattened arrays.
    Inverse of the true-at-60° projection; engine ig packing above."""
    pi_ = F.col("ig1") / 100.0
    pj_ = F.col("ig2") / 100.0
    d60 = F.col("ig3") * 100.0
    dgrw = F.col("ig4") / 100.0
    import math

    scale = EARTH_RADIUS_M * (1.0 + math.sin(math.radians(60.0)))
    k = F.sequence(F.lit(0), ni * nj - 1)

    def _cell(fn):
        return F.transform(k, fn)

    def _xy(x):
        i = (x % ni + 1).cast("double")
        j = (F.floor(x / ni) + 1).cast("double")
        return (i - pi_) * d60, (j - pj_) * d60

    def _lat(x):
        dx, dy = _xy(x)
        r = F.sqrt(dx * dx + dy * dy)
        lat = 90.0 - 2.0 * F.degrees(F.atan(r / scale))
        return -lat if south else lat

    def _lon(x):
        dx, dy = _xy(x)
        ang = F.degrees(F.atan2(dy, dx))
        lon = (dgrw - ang) if south else (dgrw + ang)
        return F.pmod(lon, F.lit(360.0))

    return _cell(_lat), _cell(_lon)


def _e_latlon(ni: Column, nj: Column):
    """E rotated-lat-lon per-cell (lat, lon): orthonormal basis from the
    two reference points, A-style uniform coordinates in the rotated
    frame, inverse rotation per cell — all native trig expressions."""
    lat1 = F.radians(F.col("ig1") / 100.0 - 90.0)
    lon1 = F.radians(F.col("ig2") / 100.0)
    lat2 = F.radians(F.col("ig3") / 100.0 - 90.0)
    lon2 = F.radians(F.col("ig4") / 100.0)
    # e1 = P1; p2 = second equator point; e3 = unit(e1 x p2); e2 = e3 x e1
    e1x, e1y, e1z = (F.cos(lat1) * F.cos(lon1), F.cos(lat1) * F.sin(lon1),
                     F.sin(lat1))
    p2x, p2y, p2z = (F.cos(lat2) * F.cos(lon2), F.cos(lat2) * F.sin(lon2),
                     F.sin(lat2))
    cx = e1y * p2z - e1z * p2y
    cy = e1z * p2x - e1x * p2z
    cz = e1x * p2y - e1y * p2x
    cn = F.sqrt(cx * cx + cy * cy + cz * cz)
    e3x, e3y, e3z = cx / cn, cy / cn, cz / cn
    e2x = e3y * e1z - e3z * e1y
    e2y = e3z * e1x - e3x * e1z
    e2z = e3x * e1y - e3y * e1x

    k = F.sequence(F.lit(0), ni * nj - 1)

    def _rot(x):
        i = (x % ni).cast("double")
        j = F.floor(x / ni).cast("double")
        rlon = F.radians(i * 360.0 / ni)
        rlat = F.radians(-90.0 + (j + 0.5) * 180.0 / nj)
        vx = (F.cos(rlat) * F.cos(rlon) * e1x
              + F.cos(rlat) * F.sin(rlon) * e2x + F.sin(rlat) * e3x)
        vy = (F.cos(rlat) * F.cos(rlon) * e1y
              + F.cos(rlat) * F.sin(rlon) * e2y + F.sin(rlat) * e3y)
        vz = (F.cos(rlat) * F.cos(rlon) * e1z
              + F.cos(rlat) * F.sin(rlon) * e2z + F.sin(rlat) * e3z)
        return vx, vy, vz

    lat2d = F.transform(k, lambda x: F.degrees(F.asin(
        F.greatest(F.least(_rot(x)[2], F.lit(1.0)), F.lit(-1.0)))))
    lon2d = F.transform(k, lambda x: F.pmod(
        F.degrees(F.atan2(_rot(x)[1], _rot(x)[0])), F.lit(360.0)))
    return lat2d, lon2d


def _u_latlon(axy: Column):
    """U composite per-cell (lat, lon): unpack the two subgrids from the
    ``^>`` payload and concatenate their outer products along j."""
    ni1 = F.element_at(axy, 2).cast("int")
    nj1 = F.element_at(axy, 3).cast("int")
    ni2 = F.element_at(axy, 4).cast("int")
    nj2 = F.element_at(axy, 5).cast("int")
    ax1 = F.slice(axy, 6, ni1)
    ay1 = F.slice(axy, 6 + ni1, nj1)
    ax2 = F.slice(axy, 6 + ni1 + nj1, ni2)
    ay2 = F.slice(axy, 6 + ni1 + nj1 + ni2, nj2)

    def _outer(ax, ay, ni, nj, pick):
        k = F.sequence(F.lit(0), ni * nj - 1)
        if pick == "lon":
            return F.transform(k, lambda x: F.element_at(ax, (x % ni + 1).cast("int")))
        return F.transform(k, lambda x: F.element_at(ay, (F.floor(x / ni) + 1).cast("int")))

    lat = F.concat(_outer(ax1, ay1, ni1, nj1, "lat"),
                   _outer(ax2, ay2, ni2, nj2, "lat"))
    lon = F.concat(_outer(ax1, ay1, ni1, nj1, "lon"),
                   _outer(ax2, ay2, ni2, nj2, "lon"))
    return lat, lon, ni1, nj1 + nj2


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
    no_meta = df.filter(~F.col("nomvar").isin(META_NOMVARS)
                        | F.col("nomvar").isNull())
    unsupported = (
        no_meta.select("grtyp").distinct()
        .filter(~F.col("grtyp").isin(SUPPORTED_GRTYPS))
        .collect()
    )
    if unsupported:
        bad = sorted(r.grtyp for r in unsupported)
        # X = unstructured/no-projection: the reference skips it with a
        # warning (std_grid.py:181-183); anything else is an error
        if bad != ["X"]:
            raise GridDefinitionError(
                f"unsupported grid type(s) {bad}; supported: {SUPPORTED_GRTYPS}")
        import logging
        logging.warning("X is an unsupported grid type! skipping its grids")
        no_meta = no_meta.filter(F.col("grtyp") != "X")

    # one representative per GEOMETRY: for ordinary grids the grid id
    # determines the geometry, but each '#' record is its own tile
    # (ig3/ig4 origin + ni/nj extent), so '#' partitions additionally on
    # the tile key — a multi-tile grid emits one LA/LO pair PER TILE
    # instead of silently attributing the first tile's coordinates to
    # every record of the grid
    tile_key = F.when(
        F.col("grtyp") == "#",
        F.concat_ws("_", "ig3", "ig4", "ni", "nj")).otherwise(F.lit(""))
    # deterministic representative: ties on (nomvar, ip1, ip2, ip3) —
    # duplicate records differing only in d/typvar — previously let
    # row_number pick by partition timing, so the LA/LO template
    # columns (etiket, dateo, ...) could differ per run; the (path,
    # key) identity breaks the tie in file order when present
    tiebreak = [c for c in ("path", "key") if c in df.columns]
    # content-hash fallback when (path, key) are absent: otherwise
    # row_number breaks residual ties by partition timing and the
    # LA/LO template columns could differ per run (round-16 advice)
    _content = [c for c in ("nomvar", "typvar", "etiket", "ni", "nj",
                            "dateo", "deet", "npas", "ip1", "ip2", "ip3",
                            "ig1", "ig2", "ig3", "ig4", "grtyp", "d")
                if c in df.columns]
    if not tiebreak and not _content:
        # an empty struct hashes to a constant, silently reverting to
        # the partition-timing-dependent pick this fallback exists to
        # eliminate — fail loudly instead (round-17 advice)
        raise ValueError(
            "latlon representative tiebreak: frame has neither "
            "(path, key) identity columns nor any record content "
            "columns to hash; cannot pick a deterministic "
            "representative")
    content_tb = tiebreak or [F.xxhash64(F.struct(*_content))]
    w = Window.partitionBy("grid", "_tile") \
              .orderBy("nomvar", "ip1", "ip2", "ip3", *content_tb)
    rep = (
        no_meta.withColumn("_tile", tile_key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn", "_tile")
    )

    # axis records: >> holds the lon axis (ni x 1), ^^ the lat axis
    # (1 x nj), ^> the packed U-grid subgrid axes. ONE row per grid:
    # a multi-file read carries the SAME >>/^^ once per file, and a
    # bare join on grid would fan rep out — duplicate LA/LO pairs per
    # grid, one per copy of the axis record (round-15 review; pinned).
    def _one_axis_per_grid(nomvar: str, alias: str) -> DataFrame:
        rows = df.filter(F.col("nomvar") == nomvar)
        # without (path, key) identity columns, tiebreak on the axis
        # CONTENT: orderBy(lit(1)) let row_number pick an arbitrary,
        # partition-timing-dependent copy — deterministic only if all
        # same-grid copies are byte-identical. A content hash makes the
        # kept row the same every run; remaining ties are genuinely
        # byte-identical payloads, where any pick is the same output.
        aw = Window.partitionBy("grid").orderBy(
            *(tiebreak or [F.xxhash64("d")]))
        return (rows.withColumn("_arn", F.row_number().over(aw))
                .filter(F.col("_arn") == 1)
                .select(F.col("grid"), F.col("d").alias(alias)))

    ax = _one_axis_per_grid(">>", "_ax")
    ay = _one_axis_per_grid("^^", "_ay")
    axy = _one_axis_per_grid("^>", "_axy")
    rep = (rep.join(F.broadcast(ax), "grid", "left")
              .join(F.broadcast(ay), "grid", "left")
              .join(F.broadcast(axy), "grid", "left"))

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
    # '#' = tiled Z (librmn ezscint semantics, reference std_grid.py:
    # 74-109 via rmn.readGrid): the record's ig3/ig4 are the 1-based
    # tile origin within the full >>/^^ reference axes, and the tile's
    # axes are the ni/nj-long slices starting there (legacy records
    # with ig3/ig4 = 0 mean origin 1)
    # a tile overrunning its reference axis (corrupt/mismatched record)
    # yields NULL axes -> NULL lat/lon for that row, instead of an ANSI
    # INVALID_ARRAY_INDEX aborting the whole job in _expand_2d
    o3 = F.greatest(F.col("ig3"), F.lit(1))
    o4 = F.greatest(F.col("ig4"), F.lit(1))
    tile_ax = F.when(o3 + ni - 1 <= F.size("_ax"),
                     F.slice(F.col("_ax"), o3, ni))
    tile_ay = F.when(o4 + nj - 1 <= F.size("_ay"),
                     F.slice(F.col("_ay"), o4, nj))
    axis_x = F.when(grtyp == "#", tile_ax).otherwise(
        F.coalesce(_axis_lon(grtyp, ni, F.col("ig2")), F.col("_ax")))
    axis_y = F.when(grtyp == "#", tile_ay).otherwise(
        F.coalesce(_axis_lat(grtyp, nj, F.col("ig1"), gauss), F.col("_ay")))
    lat2d, lon2d = _expand_2d(axis_x, axis_y, ni, nj)
    n_lat, n_lon = _ps_latlon(ni, nj, south=False)
    s_lat, s_lon = _ps_latlon(ni, nj, south=True)
    e_lat, e_lon = _e_latlon(ni, nj)
    u_lat, u_lon, u_ni, u_nj = _u_latlon(F.col("_axy"))
    # Y grids: >>/^^ already hold full 2-D lon/lat
    lat2d = (F.when(grtyp == "Y", F.col("_ay"))
             .when(grtyp == "N", n_lat).when(grtyp == "S", s_lat)
             .when(grtyp == "E", e_lat)
             .when(grtyp == "U", u_lat).otherwise(lat2d))
    lon2d = (F.when(grtyp == "Y", F.col("_ax"))
             .when(grtyp == "N", n_lon).when(grtyp == "S", s_lon)
             .when(grtyp == "E", e_lon)
             .when(grtyp == "U", u_lon).otherwise(lon2d))

    computed = (
        rep.withColumn("_lat", lat2d).withColumn("_lon", lon2d)
        # LA/LO dims follow the composite lat shape (std_grid.py:189-199)
        .withColumn("ni", F.when(grtyp == "U", u_ni).otherwise(F.col("ni")))
        .withColumn("nj", F.when(grtyp == "U", u_nj).otherwise(F.col("nj")))
    )
    la = computed.withColumn("nomvar", F.lit("LA")) \
                 .withColumn("d", F.col("_lat"))
    lo = computed.withColumn("nomvar", F.lit("LO")) \
                 .withColumn("d", F.col("_lon"))
    out = la.unionByName(lo).drop("_ax", "_ay", "_lat", "_lon")
    if not keep_template_cols:
        out = out.select("grid", "nomvar", "ni", "nj", "grtyp", "d")
    return out


def is_global_grid(df: DataFrame, epsilon: float = 0.001,
                   latlon: "DataFrame | None" = None) -> DataFrame:
    """G14: per grid, (global_grid, repetition) flags following the
    reference's rules (std_grid.py:208-270): A/G global; B global with
    repeated longitude; Z global iff first lon == last lon (eps); L by
    dlon coverage arithmetic. Pass ``latlon`` (a prior
    :func:`grid_lat_lon` result) to reuse its plan instead of
    recomputing the LA/LO expansion.

    Exactly ONE row per (grid, grtyp): multi-tile ``#`` grids emit one
    LO record per tile, so the per-row flags are folded with ``bool_or``
    — callers joining the flags back on ``grid`` never fan out.  The
    group is per-grid (a handful of rows), so the added exchange is
    negligible next to the LA/LO expansion itself."""
    lo = (grid_lat_lon(df) if latlon is None else latlon).filter(
        F.col("nomvar") == "LO").select(
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
    ).groupBy("grid", "grtyp").agg(
        F.bool_or("global_grid").alias("global_grid"),
        F.bool_or("repetition").alias("repetition"),
    )


def df_from_grid(spark, grid_params: dict) -> DataFrame:
    """G15 (std_grid.py:13-44): build ``>>``/``^^`` axis records from a
    grid-params dict (keys: grtyp in Z/Y, ni, nj, ig1, ig2, grref,
    ig1ref..ig4ref, ax, ay)."""
    g = grid_params
    if g.get("grtyp") not in ("Z", "Y", "U"):
        raise GridDefinitionError("df_from_grid supports Z, Y and U grids")
    base = dict(
        typvar="X", etiket="", nk=1, dateo=0, ip1=int(g["ig1"]),
        ip2=int(g["ig2"]), ip3=0, deet=0, npas=0, datyp=5, nbits=32,
        grtyp=g.get("grref", "L"), ig1=int(g.get("ig1ref", 0)),
        ig2=int(g.get("ig2ref", 0)), ig3=int(g.get("ig3ref", 0)),
        ig4=int(g.get("ig4ref", 0)), datev=0,
        grid=f"{int(g['ig1'])}{int(g['ig2'])}",
    )
    if g["grtyp"] == "U":
        sub = g["subgrids"]  # [(ax1, ay1), (ax2, ay2)]
        (ax1, ay1), (ax2, ay2) = sub
        axy = ([2.0, float(len(ax1)), float(len(ay1)),
                float(len(ax2)), float(len(ay2))]
               + [float(x) for x in ax1] + [float(y) for y in ay1]
               + [float(x) for x in ax2] + [float(y) for y in ay2])
        rows = [dict(base, nomvar="^>", ni=len(axy), nj=1, d=axy)]
    else:
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
