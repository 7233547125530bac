"""Write-path encoders — inverses of the decode cascade (SURVEY §2.8
C14-C16, C22; reference std_enc.py:10-175, utils.py:206-218,
dataframe.py:148-167).

All native Column expressions; every encoder round-trips with its decoder
(tested decode(encode(x)) == x), which is the reference's implicit
correctness contract (std_enc.py <-> std_dec.py).
"""

from __future__ import annotations

from zoneinfo import available_timezones

from pyspark.sql import Column
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.codecs import encode_ip_expr
from fstd2pandas_spark.schema import DATYP_DICT


class InvalidTimezoneError(Exception):
    pass


def encoded_etiket(label: Column, run: Column, implementation: Column,
                   ensemble_member: Column) -> Column:
    """Rebuild an etiket from its parsed parts (std_enc.py:10-33):
    run + label + implementation + member, each skipped when NULL."""
    blank = F.lit("")
    return F.concat(
        F.coalesce(run, blank),
        F.coalesce(label, blank),
        F.coalesce(implementation, blank),
        F.coalesce(ensemble_member, blank),
    )


def encoded_npas_and_ip2(forecast_seconds: Column, deet: Column) -> Column:
    """struct(npas, ip2) from a forecast duration and the model time step
    (std_enc.py:48-66): npas = seconds/deet; ip2 = new-style encoded
    hours (kind 10)."""
    npas = F.when(deet != 0, (forecast_seconds / deet).cast("int")) \
            .otherwise(F.lit(0))
    ip2 = encode_ip_expr((forecast_seconds / 3600.0), F.lit(10))
    return F.struct(npas.alias("npas"), ip2.alias("ip2"))


def encoded_datyp(data_type_str: Column) -> Column:
    """Letter alias -> datyp int (std_enc.py:120-130, inverse DATYP_DICT;
    first key wins for duplicated aliases, matching dict inversion)."""
    inv: dict[str, int] = {}
    for k, v in DATYP_DICT.items():
        inv.setdefault(v, k)
    expr = F.lit(None).cast("int")
    for s, k in inv.items():
        expr = F.when(data_type_str == F.lit(s), F.lit(k)).otherwise(expr)
    return expr


#: flag -> typvar 2nd char, in the reference's evaluation order
#: (std_enc.py:132-160: last true flag wins, >1 true forces 'M')
_TYPVAR2_ORDER = [
    ("zapped", "Z"), ("filtered", "F"), ("interpolated", "I"),
    ("unit_converted", "U"), ("bounded", "B"),
    ("ensemble_extra_info", "!"), ("multiple_modifications", "M"),
]


def modifiers_to_typvar2(zapped: Column, filtered: Column,
                         interpolated: Column, unit_converted: Column,
                         bounded: Column, ensemble_extra_info: Column,
                         multiple_modifications: Column) -> Column:
    """Second typvar letter from the 7 modifier flags: the single true
    flag's letter; more than one true forces 'M'; none -> ''."""
    flags = dict(zapped=zapped, filtered=filtered, interpolated=interpolated,
                 unit_converted=unit_converted, bounded=bounded,
                 ensemble_extra_info=ensemble_extra_info,
                 multiple_modifications=multiple_modifications)
    n_true = sum(
        (F.when(flags[name], 1).otherwise(0) for name, _ in _TYPVAR2_ORDER),
        F.lit(0),
    )
    last = F.lit("")
    for name, ch in _TYPVAR2_ORDER:
        last = F.when(flags[name], F.lit(ch)).otherwise(last)
    return F.when(n_true > 1, F.lit("M")).otherwise(last)


def encoded_time_interval_ips(ip2_hours: Column, ip3_hours: Column) -> Column:
    """struct(ip2, ip3): both interval bounds new-style encoded with the
    hours kind (std_enc.py:163-175 via EncodeIp — v1 -> ip2, v2 -> ip3)."""
    return F.struct(
        encode_ip_expr(ip2_hours.cast("double"), F.lit(10)).alias("ip2"),
        encode_ip_expr(ip3_hours.cast("double"), F.lit(10)).alias("ip3"),
    )


#: datyp -> precision rank (utils.py:208 ``datyp_priority``)
DATYP_PRIORITY = {-1: -1, 0: 0, 1: 5, 2: 1, 4: 3, 5: 7, 6: 4, 7: 0,
                  8: 9, 130: 2, 133: 8, 134: 6}


def _priority(datyp: Column) -> Column:
    expr = F.lit(0)
    for k, v in DATYP_PRIORITY.items():
        expr = F.when(datyp == F.lit(k), F.lit(v)).otherwise(expr)
    return expr


def precision_max(datyp_a: Column, nbits_a: Column,
                  datyp_b: Column, nbits_b: Column) -> Column:
    """struct(datyp, nbits) of the most precise of two encodings
    (utils.py:206-218 FstPrecision.max): the datyp with the higher
    priority rank (returned as the original code, not the rank) and the
    larger nbits."""
    pa, pb = _priority(datyp_a), _priority(datyp_b)
    return F.struct(
        F.when(pa >= pb, datyp_a).otherwise(datyp_b).alias("datyp"),
        F.greatest(nbits_a, nbits_b).alias("nbits"),
    )


def to_timezone(ts: Column, timezone: str) -> Column:
    """C14 (dataframe.py:148-167): UTC wall time (TIMESTAMP_NTZ,
    stamp_to_timestamp's type) -> naive wall time in the given zone;
    the zone is validated eagerly.

    Independent of spark.sql.session.timeZone (round 17): the old
    ``from_utc_timestamp(ts, zone)`` re-interpreted its input through
    the session clock, shifting date_local 100% under a non-UTC
    session; ``convert_timezone`` with BOTH zones explicit never
    touches the session."""
    if timezone not in available_timezones():
        raise InvalidTimezoneError(f"Invalid timezone: {timezone!r}")
    return F.convert_timezone(F.lit("UTC"), F.lit(timezone),
                              ts.cast("timestamp_ntz"))
