"""Deterministic synthetic `fst_records` fixture (FIXTURES.md §1).

Builds a small record table exercising: meta/non-meta split, grid
association (>>,^^ share (ip1,ip2) with data rows' (ig1,ig2)), vertical
coordinate families (PRESSURE_2001, SIGMA_1001 with P0/PT, HYBRID_5005
with !! + P0), masked pairs (typvar '@@'), duplicates on the 19-col dedup
key, multi-file paths, and old+new style ip1 encodings.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from fstd2pandas_spark.schema import RECORD_SCHEMA
from fstd2pandas_spark.functions.codecs import encode_ip_py, datetime_to_stamp_py

import datetime as dt

BASE_DATE = dt.datetime(2020, 7, 14, 12, 0)


def _mk_row(nomvar, typvar, etiket, ni, nj, dateo_dt, ip1, ip2, ip3, deet,
            npas, datyp, nbits, grtyp, ig1, ig2, ig3, ig4, d, path, key):
    dateo = datetime_to_stamp_py(dateo_dt)
    datev_dt = dateo_dt + dt.timedelta(seconds=deet * npas)
    datev = datetime_to_stamp_py(datev_dt)
    if nomvar in ("^>", ">>", "^^", "!!", "!!SF"):
        grid = f"{ip1}{ip2}"
    elif nomvar == "HY":
        grid = "None"
    else:
        grid = f"{ig1}{ig2}"
    return (nomvar, typvar, etiket, ni, nj, 1, dateo, ip1, ip2, ip3, deet,
            npas, datyp, nbits, grtyp, ig1, ig2, ig3, ig4, datev, grid,
            [float(x) for x in d], path, key)


def build_fst_records(spark: SparkSession) -> DataFrame:
    rng = np.random.RandomState(42)
    rows = []
    key = [0]

    def add(path, **kw):
        key[0] += 1
        rows.append(_mk_row(path=path, key=key[0], **kw))

    # --- grid 1: Z grid, (ig1,ig2) = (11, 22); pressure + hybrid levels ---
    g1 = dict(ni=6, nj=4, grtyp="Z", ig1=11, ig2=22, ig3=0, ig4=0)
    ax = dict(ni=6, nj=1, grtyp="E", ig1=900, ig2=0, ig3=0, ig4=0)
    # axis records: ip1,ip2 match data rows' ig1,ig2
    add("f1", nomvar=">>", typvar="X", etiket="AXIS", dateo_dt=BASE_DATE,
        ip1=11, ip2=22, ip3=0, deet=0, npas=0, datyp=5, nbits=32,
        d=np.linspace(-80, -70, 6), **ax)
    ax_lat = dict(ax, ni=1, nj=4)
    add("f1", nomvar="^^", typvar="X", etiket="AXIS", dateo_dt=BASE_DATE,
        ip1=11, ip2=22, ip3=0, deet=0, npas=0, datyp=5, nbits=32,
        d=np.linspace(40, 46, 4), **ax_lat)
    # toctoc for hybrid 5005 on grid 1: (3 x nlevels) table, column j =
    # (ip1, A, B); column 2's A doubles as pref (std_vgrid.py:282); B=1 and
    # A=ln(eta*pref) makes pres = eta * P0 (easy oracle)
    _pref = 100000.0
    _tt_cols = [(1, 0.0, 0.0), (2, _pref, 0.0)]
    for hy in [0.36116, 0.85, 1.0]:
        _tt_cols.append((encode_ip_py(hy, 5), math.log(hy * _pref), 1.0))
    add("f1", nomvar="!!", typvar="X", etiket="TOCTOC", dateo_dt=BASE_DATE,
        ip1=11, ip2=22, ip3=0, deet=0, npas=0, datyp=5, nbits=64,
        ni=3, nj=len(_tt_cols), grtyp="X", ig1=5005, ig2=0, ig3=0, ig4=0,
        d=[v for col in _tt_cols for v in col])
    # P0 surface pressure on grid 1 (two forecast hours)
    for hh, npas in [(0, 0), (6, 72)]:
        add("f1", nomvar="P0", typvar="P", etiket="R1_V710_N",
            dateo_dt=BASE_DATE, ip1=0, ip2=hh, ip3=0, deet=300, npas=npas,
            datyp=134, nbits=16,
            d=1000.0 + rng.rand(24) * 20, **g1)
    # TT at 4 pressure levels (new-style mb encodings) × 2 hours
    for hh, npas in [(0, 0), (6, 72)]:
        for mb in [1000, 925, 850, 500]:
            add("f1", nomvar="TT", typvar="P", etiket="R1_V710_N",
                dateo_dt=BASE_DATE, ip1=encode_ip_py(float(mb), 2),
                ip2=hh, ip3=0, deet=300, npas=npas, datyp=134, nbits=16,
                d=rng.randn(24) * 5 + (15 - mb / 100.0), **g1)
    # UU/VV at hybrid levels (kind 5) hour 0
    for nv in ["UU", "VV"]:
        for hy in [0.36116, 0.85, 1.0]:
            add("f1", nomvar=nv, typvar="P", etiket="R1_V710_N",
                dateo_dt=BASE_DATE, ip1=encode_ip_py(hy, 5), ip2=0, ip3=0,
                deet=300, npas=0, datyp=134, nbits=16,
                d=rng.randn(24) * 10, **g1)

    # --- grid 2: L grid, (ig1,ig2) = (33, 44); sigma levels + P0/PT, file f2 ---
    g2 = dict(ni=4, nj=3, grtyp="L", ig1=33, ig2=44, ig3=0, ig4=0)
    add("f2", nomvar=">>", typvar="X", etiket="AXIS", dateo_dt=BASE_DATE,
        ip1=33, ip2=44, ip3=0, deet=0, npas=0, datyp=5, nbits=32,
        ni=4, nj=1, grtyp="E", ig1=901, ig2=0, ig3=0, ig4=0,
        d=np.linspace(10, 13, 4))
    add("f2", nomvar="^^", typvar="X", etiket="AXIS", dateo_dt=BASE_DATE,
        ip1=33, ip2=44, ip3=0, deet=0, npas=0, datyp=5, nbits=32,
        ni=1, nj=3, grtyp="E", ig1=901, ig2=0, ig3=0, ig4=0,
        d=np.linspace(-5, -3, 3))
    add("f2", nomvar="P0", typvar="P", etiket="G133K80N", dateo_dt=BASE_DATE,
        ip1=0, ip2=0, ip3=0, deet=3600, npas=0, datyp=134, nbits=16,
        d=980.0 + rng.rand(12) * 40, **g2)
    add("f2", nomvar="PT", typvar="P", etiket="G133K80N", dateo_dt=BASE_DATE,
        ip1=0, ip2=0, ip3=0, deet=3600, npas=0, datyp=134, nbits=16,
        d=np.full(12, 10.0), **g2)
    # HU at old-style sigma levels
    for sg in [0.995, 0.85, 1.0]:
        add("f2", nomvar="HU", typvar="P", etiket="G133K80N",
            dateo_dt=BASE_DATE, ip1=2000 + int(round(sg * 10000)), ip2=0,
            ip3=0, deet=3600, npas=0, datyp=134, nbits=16,
            d=np.abs(rng.randn(12)) * 0.01, **g2)
    # GZ with a masked pair (typvar contains '@')
    gz = rng.randn(12) * 50 + 500
    mask = (rng.rand(12) > 0.3).astype(float)
    add("f2", nomvar="GZ", typvar="P@", etiket="G133K80N", dateo_dt=BASE_DATE,
        ip1=encode_ip_py(500.0, 2), ip2=0, ip3=0, deet=3600, npas=0,
        datyp=134, nbits=16, d=gz, **g2)
    add("f2", nomvar="GZ", typvar="@@", etiket="G133K80N", dateo_dt=BASE_DATE,
        ip1=encode_ip_py(500.0, 2), ip2=0, ip3=0, deet=3600, npas=0,
        datyp=2, nbits=1, d=mask, **g2)
    # meters-above-ground (kind 4) field incl. surface 0 m; constant field
    add("f2", nomvar="FB", typvar="P", etiket="G133K80N", dateo_dt=BASE_DATE,
        ip1=encode_ip_py(0.0, 4), ip2=0, ip3=0, deet=3600, npas=0,
        datyp=134, nbits=16, d=np.full(12, 3.25), **g2)
    # interval-encoded precip (time interval hours 0..6 packed in ip2/ip3)
    add("f2", nomvar="PR", typvar="P", etiket="G133K80N", dateo_dt=BASE_DATE,
        ip1=0, ip2=encode_ip_py(6.0, 10), ip3=encode_ip_py(0.0, 10),
        deet=3600, npas=6, datyp=134, nbits=16,
        d=np.abs(rng.randn(12)) * 2, **g2)

    # duplicate row on the 19-col dedup key (same everything but d)
    add("f2", nomvar="HU", typvar="P", etiket="G133K80N", dateo_dt=BASE_DATE,
        ip1=2000 + 9950, ip2=0, ip3=0, deet=3600, npas=0, datyp=134,
        nbits=16, d=np.abs(rng.randn(12)) * 0.01, **g2)
    # --- grid 3: bare pressure-level grid (no meta) -> PRESSURE_2001 ---
    g3 = dict(ni=3, nj=2, grtyp="L", ig1=55, ig2=66, ig3=0, ig4=0)
    for mb in [500, 850]:
        add("f2", nomvar="TT", typvar="P", etiket="G133K80N",
            dateo_dt=BASE_DATE, ip1=mb, ip2=0, ip3=0, deet=3600, npas=0,
            datyp=134, nbits=16, d=rng.randn(6) * 5, **g3)

    # HY record (hybrid params, grid-independent)
    add("f1", nomvar="HY", typvar="X", etiket="HYBRID", dateo_dt=BASE_DATE,
        ip1=encode_ip_py(10.0, 2), ip2=0, ip3=0, deet=0, npas=0, datyp=5,
        nbits=32, ni=1, nj=1, grtyp="X", ig1=800, ig2=1000, ig3=0, ig4=0,
        d=[10.0])

    return spark.createDataFrame(rows, RECORD_SCHEMA)
