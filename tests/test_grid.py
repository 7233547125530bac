"""Grid/coordinate layer tests (SURVEY §2.9 G12-G16) against numpy
ground truth of the public grid-type formulas."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.grid import (
    GridDefinitionError,
    df_from_grid,
    gaussian_latitudes,
    grid_lat_lon,
    grid_metadata_for,
    is_global_grid,
    l_grid_igs,
)

_REC = ("nomvar string, typvar string, etiket string, ni int, nj int, nk int, "
        "dateo bigint, ip1 int, ip2 int, ip3 int, deet int, npas int, "
        "datyp int, nbits int, grtyp string, ig1 int, ig2 int, ig3 int, "
        "ig4 int, datev bigint, grid string, d array<float>")


def _rec(nomvar="TT", grtyp="L", ni=4, nj=3, ig=(0, 0, 0, 0), grid="g1",
         d=None, ip1=0, ip2=0):
    return dict(nomvar=nomvar, typvar="P", etiket="T", ni=ni, nj=nj, nk=1,
                dateo=0, ip1=ip1, ip2=ip2, ip3=0, deet=0, npas=0, datyp=134,
                nbits=16, grtyp=grtyp, ig1=ig[0], ig2=ig[1], ig3=ig[2],
                ig4=ig[3], datev=0, grid=grid,
                d=d or [0.0] * (ni * nj))


def _latlon(spark, rows):
    df = spark.createDataFrame(rows, schema=_REC)
    out = grid_lat_lon(df).select("grid", "nomvar", "d").collect()
    return {(r.grid, r.nomvar): np.array(r.d) for r in out}


def test_ig_packing_round_trip_property():
    """Engine-convention ig packing is exactly invertible at its stated
    fixed-point resolution (0.01 deg / 100 m) — the property a cigaxg
    bit-parity swap must preserve (grid.py module docstring boundary)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fstd2pandas_spark.operators.grid import (
        e_grid_igs, l_grid_igs, ps_grid_igs)

    cent = st.integers(-9000, 9000).map(lambda c: c / 100.0)
    loncent = st.integers(0, 35999).map(lambda c: c / 100.0)
    step = st.integers(1, 1000).map(lambda c: c / 100.0)

    @settings(max_examples=50, deadline=None)
    @given(lat0=cent, lon0=st.integers(-18000, 17999).map(lambda c: c / 100.0),
           dlat=step, dlon=step)
    def l_round(lat0, lon0, dlat, dlon):
        ig1, ig2, ig3, ig4 = l_grid_igs(lat0, lon0, dlat, dlon)
        assert ig1 / 100.0 - 90.0 == pytest.approx(lat0, abs=1e-9)
        assert ig2 / 100.0 - 180.0 == pytest.approx(lon0, abs=1e-9)
        assert ig3 / 100.0 == pytest.approx(dlat, abs=1e-9)
        assert ig4 / 100.0 == pytest.approx(dlon, abs=1e-9)

    @settings(max_examples=50, deadline=None)
    @given(pi=step, pj=step,
           d60=st.integers(1, 10000).map(lambda c: c * 100.0),
           dgrw=loncent)
    def ps_round(pi, pj, d60, dgrw):
        ig1, ig2, ig3, ig4 = ps_grid_igs(pi, pj, d60, dgrw)
        assert ig1 / 100.0 == pytest.approx(pi, abs=1e-9)
        assert ig2 / 100.0 == pytest.approx(pj, abs=1e-9)
        assert ig3 * 100.0 == pytest.approx(d60, abs=1e-9)
        assert ig4 / 100.0 == pytest.approx(dgrw, abs=1e-9)

    @settings(max_examples=50, deadline=None)
    @given(xlat1=cent, xlon1=loncent, xlat2=cent, xlon2=loncent)
    def e_round(xlat1, xlon1, xlat2, xlon2):
        ig1, ig2, ig3, ig4 = e_grid_igs(xlat1, xlon1, xlat2, xlon2)
        assert ig1 / 100.0 - 90.0 == pytest.approx(xlat1, abs=1e-9)
        assert ig2 / 100.0 == pytest.approx(xlon1, abs=1e-9)
        assert ig3 / 100.0 - 90.0 == pytest.approx(xlat2, abs=1e-9)
        assert ig4 / 100.0 == pytest.approx(xlon2, abs=1e-9)

    l_round()
    ps_round()
    e_round()


def test_l_grid_latlon(spark):
    igs = l_grid_igs(lat0=40.0, lon0=-80.0, dlat=2.0, dlon=3.0)
    got = _latlon(spark, [_rec(grtyp="L", ni=4, nj=3, ig=igs)])
    lon_axis = -80.0 + np.arange(4) * 3.0
    lat_axis = 40.0 + np.arange(3) * 2.0
    np.testing.assert_allclose(got[("g1", "LO")], np.tile(lon_axis, 3), atol=1e-5)
    np.testing.assert_allclose(got[("g1", "LA")], np.repeat(lat_axis, 4), atol=1e-5)


def test_a_b_grid_latlon(spark):
    got = _latlon(spark, [
        _rec(grtyp="A", ni=6, nj=4, grid="ga"),
        _rec(grtyp="B", ni=5, nj=3, grid="gb"),
    ])
    np.testing.assert_allclose(
        got[("ga", "LO")][:6], np.arange(6) * 60.0, atol=1e-5)
    np.testing.assert_allclose(
        got[("ga", "LA")][::6], -90.0 + (np.arange(4) + 0.5) * 45.0, atol=1e-5)
    np.testing.assert_allclose(
        got[("gb", "LO")][:5], np.arange(5) * 90.0, atol=1e-5)
    np.testing.assert_allclose(
        got[("gb", "LA")][::5], [-90.0, 0.0, 90.0], atol=1e-5)


def test_gaussian_grid_latlon(spark):
    got = _latlon(spark, [_rec(grtyp="G", ni=4, nj=4, grid="gg")])
    lats = got[("gg", "LA")][::4]
    expect = gaussian_latitudes(4)
    np.testing.assert_allclose(lats, expect, atol=1e-5)
    roots = np.sort(np.polynomial.legendre.leggauss(4)[0])
    np.testing.assert_allclose(np.sin(np.radians(expect)), roots, atol=1e-12)


def test_z_grid_latlon_outer_product(spark):
    ax = [10.0, 20.0, 30.0]
    ay = [45.0, 50.0]
    rows = [
        _rec(grtyp="Z", ni=3, nj=2, grid="gz", ig=(11, 22, 0, 0)),
        _rec(nomvar=">>", grtyp="L", ni=3, nj=1, grid="gz", d=ax,
             ip1=11, ip2=22),
        _rec(nomvar="^^", grtyp="L", ni=1, nj=2, grid="gz", d=ay,
             ip1=11, ip2=22),
    ]
    got = _latlon(spark, rows)
    np.testing.assert_allclose(got[("gz", "LO")], [10, 20, 30, 10, 20, 30])
    np.testing.assert_allclose(got[("gz", "LA")], [45, 45, 45, 50, 50, 50])


def test_duplicate_axis_records_do_not_fan_out(spark):
    """round-15 grid.py review: a multi-file read carries the SAME
    >>/^^ once per file; the bare join on grid fanned the
    representative out — DUPLICATE LA/LO pairs per grid, one per copy
    of the axis record. One axis row per grid now wins."""
    ax = [10.0, 20.0, 30.0]
    ay = [45.0, 50.0]
    rows = [
        _rec(grtyp="Z", ni=3, nj=2, grid="gz", ig=(11, 22, 0, 0)),
        # the same axis pair, "read from two files"
        _rec(nomvar=">>", grtyp="L", ni=3, nj=1, grid="gz", d=ax,
             ip1=11, ip2=22),
        _rec(nomvar=">>", grtyp="L", ni=3, nj=1, grid="gz", d=ax,
             ip1=11, ip2=22),
        _rec(nomvar="^^", grtyp="L", ni=1, nj=2, grid="gz", d=ay,
             ip1=11, ip2=22),
        _rec(nomvar="^^", grtyp="L", ni=1, nj=2, grid="gz", d=ay,
             ip1=11, ip2=22),
    ]
    out = grid_lat_lon(spark.createDataFrame(rows, schema=_REC)).collect()
    assert len(out) == 2                      # exactly one LA + one LO
    got = {r.nomvar: list(r.d) for r in out}
    np.testing.assert_allclose(got["LO"], [10, 20, 30, 10, 20, 30])
    np.testing.assert_allclose(got["LA"], [45, 45, 45, 50, 50, 50])


def test_unsupported_grtyp_raises(spark):
    df = spark.createDataFrame([_rec(grtyp="Q")], schema=_REC)
    with pytest.raises(GridDefinitionError):
        grid_lat_lon(df)


def test_is_global_grid(spark):
    rows = [
        _rec(grtyp="A", ni=4, nj=2, grid="ga"),
        _rec(grtyp="B", ni=4, nj=2, grid="gb"),
        # L global no repetition: 8 * 45 == 360
        _rec(grtyp="L", ni=8, nj=2, grid="gl1",
             ig=l_grid_igs(0.0, 0.0, 1.0, 45.0)),
        # L global with repetition: 9 * 45 == 360 + 45
        _rec(grtyp="L", ni=9, nj=2, grid="gl2",
             ig=l_grid_igs(0.0, 0.0, 1.0, 45.0)),
        # L regional: 4 * 3 deg
        _rec(grtyp="L", ni=4, nj=2, grid="gl3",
             ig=l_grid_igs(0.0, 0.0, 1.0, 3.0)),
    ]
    df = spark.createDataFrame(rows, schema=_REC)
    got = {r.grid: (r.global_grid, r.repetition)
           for r in is_global_grid(df).collect()}
    assert got["ga"] == (True, False)
    assert got["gb"] == (True, True)
    assert got["gl1"] == (True, False)
    assert got["gl2"] == (True, True)
    assert got["gl3"] == (False, False)


def test_df_from_grid_roundtrip(spark):
    """G15 then G12: constructed >>/^^ records drive the Z-grid outer
    product."""
    g = dict(grtyp="Z", ni=3, nj=2, ig1=11, ig2=22, grref="L",
             ax=[100.0, 110.0, 120.0], ay=[-10.0, 0.0])
    meta = df_from_grid(spark, g)
    assert {r.nomvar for r in meta.select("nomvar").collect()} == {">>", "^^"}
    data = spark.createDataFrame(
        [_rec(grtyp="Z", ni=3, nj=2, grid="1122", ig=(11, 22, 0, 0))],
        schema=_REC)
    both = data.unionByName(meta)
    got = {(r.grid, r.nomvar): np.array(r.d)
           for r in grid_lat_lon(both).select("grid", "nomvar", "d").collect()}
    np.testing.assert_allclose(got[("1122", "LO")],
                               [100, 110, 120, 100, 110, 120])
    np.testing.assert_allclose(got[("1122", "LA")],
                               [-10, -10, -10, 0, 0, 0])


def test_grid_metadata_for_semi_join(spark, records):
    sel = records.filter(F.col("nomvar") == "TT")
    meta = grid_metadata_for(sel, records)
    grids = {r.grid for r in sel.select("grid").distinct().collect()}
    got = {r.grid for r in meta.select("grid").distinct().collect()}
    assert got <= grids
    assert meta.filter(~F.col("nomvar").isin(
        "!!", "P0", "PT", ">>", "^^", "^>", "HY", "!!SF")).count() == 0


def test_ps_north_grid(spark):
    """N polar stereographic: pole cell -> lat 90; r at the 60-deg radius
    -> lat 60; lon = dgrw + atan2(dy, dx)."""
    import math

    from fstd2pandas_spark.operators.grid import EARTH_RADIUS_M, ps_grid_igs

    d60 = 381000.0  # 381 km
    igs = ps_grid_igs(pi=2.0, pj=2.0, d60=d60, dgrw=10.0)
    got = _latlon(spark, [_rec(grtyp="N", ni=3, nj=3, ig=igs, grid="gn")])
    lat = got[("gn", "LA")].reshape(3, 3)
    lon = got[("gn", "LO")].reshape(3, 3)
    # cell (i=2, j=2) is the pole (1-based)
    assert abs(lat[1, 1] - 90.0) < 1e-6
    # one step east of the pole: dx=d60, dy=0
    scale = EARTH_RADIUS_M * (1 + math.sin(math.radians(60)))
    expect = 90 - 2 * math.degrees(math.atan(d60 / scale))
    assert abs(lat[1, 2] - expect) < 1e-5
    assert abs(lon[1, 2] - 10.0) < 1e-5          # dgrw + atan2(0, +)
    assert abs(lon[2, 1] - 100.0) < 1e-5         # dgrw + 90 (north)
    # corners are sqrt(2)*d60 from the pole — the grid minimum
    corner = 90 - 2 * math.degrees(math.atan(math.sqrt(2) * d60 / scale))
    assert np.all(lat >= corner - 1e-6) and np.all(lat <= 90.0 + 1e-9)


def test_ps_south_grid(spark):
    from fstd2pandas_spark.operators.grid import ps_grid_igs

    igs = ps_grid_igs(pi=1.0, pj=1.0, d60=381000.0, dgrw=0.0)
    got = _latlon(spark, [_rec(grtyp="S", ni=2, nj=2, ig=igs, grid="gs")])
    lat = got[("gs", "LA")].reshape(2, 2)
    assert abs(lat[0, 0] + 90.0) < 1e-6
    assert np.all(lat <= -50.0)


def test_e_grid_identity_rotation(spark):
    """E grid with equator points (0,180) and (0,270): the rotated frame
    is the geographic frame shifted 180 deg in longitude."""
    from fstd2pandas_spark.operators.grid import e_grid_igs

    igs = e_grid_igs(0.0, 180.0, 0.0, 270.0)
    ni, nj = 4, 3
    got = _latlon(spark, [_rec(grtyp="E", ni=ni, nj=nj, ig=igs, grid="ge")])
    lat = got[("ge", "LA")].reshape(nj, ni)
    lon = got[("ge", "LO")].reshape(nj, ni)
    for j in range(nj):
        want_lat = -90 + (j + 0.5) * 180.0 / nj
        np.testing.assert_allclose(lat[j], want_lat, atol=1e-5)
    for i in range(ni):
        want_lon = (180.0 + i * 360.0 / ni) % 360.0
        np.testing.assert_allclose(lon[:, i], want_lon, atol=1e-5)


def test_e_grid_general_rotation_invariants(spark):
    """General rotation: lat stays in [-90, 90]; the rotated (0, 0) cell
    neighborhood straddles (xlat1, xlon1); rows are great circles (all
    cells in a rotated-latitude row keep constant angle to the rotated
    pole)."""
    import math

    from fstd2pandas_spark.operators.grid import e_grid_igs

    xlat1, xlon1, xlat2, xlon2 = 35.0, 250.0, 0.0, 340.0
    ni, nj = 8, 6
    igs = e_grid_igs(xlat1, xlon1, xlat2, xlon2)
    got = _latlon(spark, [_rec(grtyp="E", ni=ni, nj=nj, ig=igs, grid="gr")])
    lat = got[("gr", "LA")]
    lon = got[("gr", "LO")]
    assert np.all((lat >= -90 - 1e-9) & (lat <= 90 + 1e-9))
    assert np.all((lon >= 0) & (lon < 360))

    # rotated pole = unit(P1 x P2); every row must have constant angular
    # distance to it
    def cart(la, lo):
        la, lo = math.radians(la), math.radians(lo)
        return np.array([math.cos(la) * math.cos(lo),
                         math.cos(la) * math.sin(lo), math.sin(la)])

    pole = np.cross(cart(xlat1, xlon1), cart(xlat2, xlon2))
    pole /= np.linalg.norm(pole)
    lat2, lon2 = lat.reshape(nj, ni), lon.reshape(nj, ni)
    for j in range(nj):
        angles = [np.dot(pole, cart(lat2[j, i], lon2[j, i]))
                  for i in range(ni)]
        np.testing.assert_allclose(angles, angles[0], atol=1e-9)


def test_u_grid_composite(spark):
    """U grid: two subgrids packed in ^>, rows concatenated along j."""
    from fstd2pandas_spark.operators.grid import df_from_grid

    g = dict(grtyp="U", ig1=33, ig2=44, grref="L",
             subgrids=[([0.0, 90.0, 180.0], [-45.0, 45.0]),
                       ([10.0, 100.0, 190.0], [-30.0, 30.0])])
    meta = df_from_grid(spark, g)
    assert meta.first().nomvar == "^>"
    data = spark.createDataFrame(
        [_rec(grtyp="U", ni=3, nj=4, grid="3344", ig=(33, 44, 0, 0))],
        schema=_REC)
    got = {(r.nomvar): (np.array(r.d), r.ni, r.nj)
           for r in grid_lat_lon(data.unionByName(meta))
           .select("nomvar", "ni", "nj", "d").collect()}
    lat, ni, nj = got["LA"]
    lon, _, _ = got["LO"]
    assert (ni, nj) == (3, 4)
    np.testing.assert_allclose(
        lat, [-45, -45, -45, 45, 45, 45, -30, -30, -30, 30, 30, 30])
    np.testing.assert_allclose(
        lon, [0, 90, 180, 0, 90, 180, 10, 100, 190, 10, 100, 190])


def test_x_grid_skipped_like_reference(spark, records):
    """X (unstructured) grids skip with a warning (std_grid.py:181-183);
    other unknown types still error."""
    import pytest
    from pyspark.sql import functions as F
    from fstd2pandas_spark.operators.grid import (
        grid_lat_lon, GridDefinitionError)

    with_x = records.withColumn(
        "grtyp",
        F.when(F.col("grid") == "5566", F.lit("X")).otherwise(F.col("grtyp")))
    out = grid_lat_lon(with_x)
    grids = {r.grid for r in out.select("grid").distinct().collect()}
    assert "5566" not in grids and grids   # X skipped, others emitted

    with pytest.raises(GridDefinitionError):
        grid_lat_lon(records.withColumn("grtyp", F.lit("Q"))).collect()


def test_tiled_grid_latlon_like_z(spark):
    """'#' (tiled Z) resolves its axes from the same >>/^^ records as Z
    (reference std_grid.py grtyp table; tile offsets ride in ig3/ig4 and
    do not change the axis expansion)."""
    ax = [100.0, 110.0]
    ay = [-10.0, 0.0, 10.0]
    rows = [
        _rec(grtyp="#", ni=2, nj=3, grid="gt", ig=(12, 34, 1, 1)),
        _rec(nomvar=">>", grtyp="L", ni=2, nj=1, grid="gt", d=ax,
             ip1=12, ip2=34),
        _rec(nomvar="^^", grtyp="L", ni=1, nj=3, grid="gt", d=ay,
             ip1=12, ip2=34),
    ]
    got = _latlon(spark, rows)
    np.testing.assert_allclose(got[("gt", "LO")], [100, 110] * 3)
    np.testing.assert_allclose(got[("gt", "LA")],
                               [-10, -10, 0, 0, 10, 10])


def test_tiled_grid_slices_axis_at_tile_origin(spark):
    """'#' records are tiles of the full >>/^^ reference axes: ig3/ig4
    give the 1-based tile origin and the tile's lat/lon are the ni/nj
    slices starting there (librmn ezscint semantics, reference
    std_grid.py:74-109 via rmn.readGrid)."""
    from fstd2pandas_spark.operators.grid import grid_lat_lon
    from fstd2pandas_spark.schema import empty_record_table

    full_lon = [float(10 + 2 * i) for i in range(8)]   # 8-wide reference
    full_lat = [float(40 + 1 * j) for j in range(6)]   # 6-tall reference
    base = dict(typvar="X", etiket="", nk=1, dateo=0, ip3=0, deet=0,
                npas=0, datyp=5, nbits=32, datev=0)
    rows = [
        dict(base, nomvar="TT", ni=3, nj=2, ip1=1, ip2=0, grtyp="#",
             ig1=111, ig2=222, ig3=4, ig4=3, grid="111222",
             d=[0.0] * 6, path="", key=1),
        dict(base, nomvar=">>", ni=8, nj=1, ip1=111, ip2=222, grtyp="L",
             ig1=0, ig2=0, ig3=0, ig4=0, grid="111222",
             d=full_lon, path="", key=2),
        dict(base, nomvar="^^", ni=1, nj=6, ip1=111, ip2=222, grtyp="L",
             ig1=0, ig2=0, ig3=0, ig4=0, grid="111222",
             d=full_lat, path="", key=3),
    ]
    template = empty_record_table(spark, 1)
    df = spark.createDataFrame(
        [tuple(r.get(f.name) for f in template.schema.fields) for r in rows],
        template.schema)
    ll = {r["nomvar"]: r["d"] for r in grid_lat_lon(df).collect()}
    # tile origin (ig3=4, ig4=3): lon slice [16,18,20], lat slice [42,43]
    assert ll["LO"] == [16.0, 18.0, 20.0] * 2
    assert ll["LA"] == [42.0] * 3 + [43.0] * 3


def test_tiled_grid_multi_tile_and_overrun(spark):
    """Each '#' record is its own tile: a grid with two tiles emits one
    LA/LO pair per tile, and a tile overrunning the reference axis
    yields NULL coordinates for that row instead of aborting the job."""
    from fstd2pandas_spark.operators.grid import grid_lat_lon
    from fstd2pandas_spark.schema import empty_record_table

    full_lon = [float(10 + 2 * i) for i in range(8)]
    full_lat = [float(40 + j) for j in range(6)]
    base = dict(typvar="X", etiket="", nk=1, dateo=0, ip3=0, deet=0,
                npas=0, datyp=5, nbits=32, datev=0)
    rows = [
        dict(base, nomvar="TT", ni=3, nj=2, ip1=1, ip2=0, grtyp="#",
             ig1=111, ig2=222, ig3=1, ig4=1, grid="111222",
             d=[0.0] * 6, path="", key=1),
        dict(base, nomvar="TT", ni=3, nj=2, ip1=2, ip2=0, grtyp="#",
             ig1=111, ig2=222, ig3=4, ig4=3, grid="111222",
             d=[0.0] * 6, path="", key=2),
        dict(base, nomvar="TT", ni=5, nj=2, ip1=3, ip2=0, grtyp="#",
             ig1=111, ig2=222, ig3=7, ig4=1, grid="111222",   # overruns
             d=[0.0] * 10, path="", key=3),
        dict(base, nomvar=">>", ni=8, nj=1, ip1=111, ip2=222, grtyp="L",
             ig1=0, ig2=0, ig3=0, ig4=0, grid="111222",
             d=full_lon, path="", key=4),
        dict(base, nomvar="^^", ni=1, nj=6, ip1=111, ip2=222, grtyp="L",
             ig1=0, ig2=0, ig3=0, ig4=0, grid="111222",
             d=full_lat, path="", key=5),
    ]
    template = empty_record_table(spark, 1)
    df = spark.createDataFrame(
        [tuple(r.get(f.name) for f in template.schema.fields) for r in rows],
        template.schema)
    out = grid_lat_lon(df)
    los = {tuple(r["d"]) if r["d"] is not None else None
           for r in out.filter("nomvar = 'LO'").collect()}
    # one LO per tile: origin (1,1), origin (4,3), and the overrun tile
    # as all-NULL cells (flagged, not a job abort)
    assert (10.0, 12.0, 14.0) * 2 in los
    assert (16.0, 18.0, 20.0) * 2 in los
    assert any(v is not None and all(x is None for x in v) for v in los)
    assert out.filter("nomvar = 'LO'").count() == 3
    # is_global_grid folds the per-tile rows: exactly ONE flag row per
    # grid id, so callers joining flags on 'grid' never fan out
    flags = is_global_grid(df, latlon=out).collect()
    assert len(flags) == 1
    assert (flags[0]["global_grid"], flags[0]["repetition"]) == (False, False)
