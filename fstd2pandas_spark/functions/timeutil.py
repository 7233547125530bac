"""Config-independent wall-time epoch arithmetic (round 17).

The event/temporal plane's timestamps are TIMESTAMP_NTZ wall times
(parquet naive timestamps; the reference's RMN date stamps are UTC wall
times by definition, std_dec.py). The obvious conversion —
``F.unix_micros(ts.cast("timestamp"))`` — routes the wall time through
``spark.sql.session.timeZone``: under ``America/New_York`` every epoch,
hour bucket and session boundary silently shifts by the UTC offset (and
wall times inside a DST gap don't even exist). Engine VALUES must not
depend on session config — the same contract the ANSI cross-section
pins (tests/test_oracle_mirror_robustness.py) — so epochs here are
computed from the NTZ wall-time FIELDS directly: days since epoch of
the date part plus the time-of-day fields. Pure Catalyst expressions,
no UDF, exact to the microsecond, NULL-propagating, valid pre-1970.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ntz(col: "Column | str") -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("timestamp_ntz")


def ntz_epoch_us(col: "Column | str") -> Column:
    """Microseconds since 1970-01-01 00:00:00 of a wall time,
    independent of ``spark.sql.session.timeZone`` (long; NULL in,
    NULL out). extract(SECOND) is DECIMAL(8,6), so the microsecond
    part is exact."""
    t = _ntz(col)
    return (
        F.unix_date(t.cast("date")).cast("long") * F.lit(86_400_000_000)
        + F.hour(t).cast("long") * F.lit(3_600_000_000)
        + F.minute(t).cast("long") * F.lit(60_000_000)
        + (F.extract(F.lit("SECOND"), t) * F.lit(1_000_000)).cast("long")
    )


def ntz_epoch_s(col: "Column | str") -> Column:
    """Whole seconds since the epoch of a wall time (long, truncated
    toward the floor exactly like ``unix_timestamp`` under UTC)."""
    return F.floor(ntz_epoch_us(col) / F.lit(1_000_000)).cast("long")


def ntz_trunc(unit: str, col: "Column | str") -> Column:
    """``date_trunc`` over a wall time, independent of the session
    timezone. Spark's ``date_trunc`` routes a TIMESTAMP_NTZ input
    through an implicit session-TZ cast — under America/New_York a
    23:02 wall time truncates to 04:00 NEXT DAY, and a wall time
    inside the DST spring-forward gap collapses onto the next hour
    (measured; the round-17 TZ cross-section caught both). Field
    arithmetic (``make_timestamp_ntz`` / date ``trunc``) never touches
    the clock."""
    t = _ntz(col)
    z = F.lit(0)
    if unit == "hour":
        return F.make_timestamp_ntz(F.year(t), F.month(t),
                                    F.dayofmonth(t), F.hour(t), z, z)
    if unit == "day":
        return F.make_timestamp_ntz(F.year(t), F.month(t),
                                    F.dayofmonth(t), z, z, z)
    if unit == "week":
        d = F.trunc(t.cast("date"), "week")   # date->date: no clock
        return F.make_timestamp_ntz(F.year(d), F.month(d),
                                    F.dayofmonth(d), z, z, z)
    raise ValueError(f"ntz_trunc: unsupported unit {unit!r} "
                     "(hour/day/week)")


def wall_epoch_us(df, col_name: str) -> Column:
    """dtype-aware epoch microseconds for a named time column —
    every branch independent of ``spark.sql.session.timeZone``:

    - numeric columns are ALREADY epoch seconds (the asof/range join
      contract for integer time axes) — scaled arithmetically (the old
      ``cast("timestamp")`` route interpreted them as epoch seconds
      too, but via the session clock);
    - TIMESTAMP (LTZ) is an INSTANT — its epoch comes from the
      DECIMAL cast, which is TZ-free (an NTZ cast would render the
      session wall, the dependence being removed);
    - TIMESTAMP_NTZ / DATE / STRING are wall times -> field
      arithmetic (:func:`ntz_epoch_us`).
    """
    dt = dict(df.dtypes).get(col_name, "")
    c = F.col(col_name)
    if (dt in ("tinyint", "smallint", "int", "bigint", "long",
               "float", "double")
            or dt.startswith("decimal")):
        return (c.cast("decimal(26,6)") * F.lit(1_000_000)).cast("long")
    if dt == "timestamp":
        return (c.cast("decimal(26,6)")
                * F.lit(1_000_000)).cast("long")
    return ntz_epoch_us(c)
