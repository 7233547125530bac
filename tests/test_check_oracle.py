"""The local gate must be dtype-strict: the driver's canonicalizer
hashes raw cell values, so an int64 column on one side and a float64 on
the other hash-differ even when numerically equal. The classic instance
is DuckDB's SUM(BIGINT) -> HUGEINT -> pandas float64 (cost rounds 5, 6
and 7 of this build). These tests pin that tools/check_oracle.py now
catches the class locally, using a real DuckDB uncast-sum probe.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import dtype_divergences, dtype_kind  # noqa: E402


def test_uncast_hugeint_probe_flagged():
    """A deliberately uncast SUM(BIGINT) in DuckDB comes back float64
    and must be flagged against Spark's int64."""
    con = duckdb.connect()
    odf = con.execute(
        "SELECT k, sum(CAST(v AS BIGINT) << 4) AS packed FROM "
        "(VALUES (1, 3), (1, 4), (2, 5)) t(k, v) GROUP BY k ORDER BY k"
    ).df()
    assert odf["packed"].dtype == "float64"  # the trap itself
    sdf = pd.DataFrame({"k": [1, 2], "packed": pd.array([112, 80], dtype="int64")})
    div = dtype_divergences(sdf, odf)
    assert len(div) == 1 and div[0].startswith("packed:")


def test_cast_bigint_probe_clean():
    """The documented fix — CAST(sum(...) AS BIGINT) — yields int64 and
    must NOT be flagged."""
    con = duckdb.connect()
    odf = con.execute(
        "SELECT k, CAST(sum(CAST(v AS BIGINT) << 4) AS BIGINT) AS packed FROM "
        "(VALUES (1, 3), (1, 4), (2, 5)) t(k, v) GROUP BY k ORDER BY k"
    ).df()
    assert odf["packed"].dtype == "int64"
    sdf = pd.DataFrame({"k": [1, 2], "packed": pd.array([112, 80], dtype="int64")})
    assert dtype_divergences(sdf, odf) == []


def test_nullable_int_leniency():
    """int-vs-float where the float side carries NaN is pandas' nullable
    int representation, not the HUGEINT trap — value compare handles it."""
    sdf = pd.DataFrame({"x": pd.array([1, 2], dtype="int64")})
    odf = pd.DataFrame({"x": [1.0, float("nan")]})
    assert dtype_divergences(sdf, odf) == []
    # but a no-NaN float against int IS the trap
    odf2 = pd.DataFrame({"x": [1.0, 2.0]})
    assert len(dtype_divergences(sdf, odf2)) == 1


@pytest.mark.parametrize(
    "dtype,kind",
    [("int32", "int"), ("int64", "int"), ("float64", "float"),
     ("bool", "bool"), ("object", "other")],
)
def test_dtype_kind_classes(dtype, kind):
    s = pd.Series([0, 1]).astype(dtype)
    assert dtype_kind(s) == kind
