"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used for the strictness check.

    The driver's canonicalizer hashes raw cell values, so an int64 123
    on one side and a float64 123.0 on the other hash-differ even when
    numerically equal (the DuckDB HUGEINT trap: SUM(BIGINT) -> HUGEINT
    -> pandas float64). Width differences within a class (int32 vs
    int64) hash identically, so only the class matters.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def dtype_divergences(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Columns whose dtype CLASS differs between the Spark and oracle
    frames — these hash-fail in the driver gate even if values match."""
    out = []
    for c in sdf.columns:
        if c not in odf.columns:
            continue
        ks, ko = dtype_kind(sdf[c]), dtype_kind(odf[c])
        if ks != ko:
            # float-with-NaN is how pandas represents nullable ints from
            # either engine; a genuine divergence is int-vs-float with NO
            # nulls on the float side (a nullable int would be float on
            # BOTH sides or carry NaN).
            pair = {ks, ko}
            if pair == {"int", "float"}:
                fs = sdf[c] if ks == "float" else odf[c]
                if fs.isna().any():
                    continue
            out.append(f"{c}: spark={ks}({sdf[c].dtype}) oracle={ko}({odf[c].dtype})")
    return out


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            # unify resolution: Spark yields ns, DuckDB us — mixed units
            # with NaT present compare as raw int epochs and false-fail
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # The DRIVER's canonicalizer cannot hash list cells
            # (TypeError: unhashable type: 'list') — mirror that contract
            # here so array-valued results fail locally too.
            bad = s.map(
                lambda v: isinstance(v, (list, tuple, np.ndarray))
                and not isinstance(v, str)
            )
            if bad.any():
                raise TypeError(
                    f"column {c!r} contains array cells — the driver "
                    "canonicalizer rejects these; posexplode to scalars"
                )
            # Canonicalize the null representation: Spark toPandas
            # yields None, DuckDB .df() yields NaN in object columns.
            # pandas' assert_frame_equal currently treats them as equal
            # but warns this will FLIP in a future version — pin one
            # sentinel now so the comparison is pandas-version-proof.
            s = s.copy()
            s[s.isna()] = None
            df[c] = s
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype(float), 9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(str)
        else:
            try:
                df[c] = s.astype("float64")
            except (ValueError, TypeError):
                df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def main() -> int:
    # config sweeps (round 17): --tz=America/New_York re-runs the gates
    # under a non-UTC session, --ansi=true under ANSI — the oracles are
    # UNCHANGED (naive-as-UTC DuckDB), so any mismatch is a
    # config-dependence leak (the values-must-not-depend-on-config
    # contract; the streaming gate is the documented TZ boundary)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:]
                if a.startswith("--") and "=" in a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry_mod
    from fstd2pandas_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    if "tz" in opts:
        spark.conf.set("spark.sql.session.timeZone", opts["tz"])
    if "ansi" in opts:
        spark.conf.set("spark.sql.ansi.enabled", opts["ansi"])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(sdf)} (no oracle: rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            continue
        div = dtype_divergences(sdf, odf)
        if div:
            failures.append(name)
            print(f"FAIL {name}: dtype divergence (driver hash would fail): "
                  + "; ".join(div))
            continue
        a, b = normalize(sdf), normalize(odf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"ok   {name}: rows={len(sdf)} values match")
        except AssertionError as e:
            failures.append(name)
            msg = str(e).splitlines()
            print(f"FAIL {name}: value mismatch: {' | '.join(msg[:3])}")
            diff = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if diff[c].any()]
            for c in bad_cols[:3]:
                idx = diff[c].idxmax()
                print(f"      col={c} row={idx} spark={a[c][idx]!r} oracle={b[c][idx]!r}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
