"""Native Column-expression decoders/encoders for the record table.

Everything here compiles to Catalyst expressions (whole-stage codegen,
no Python in the hot path) unless explicitly named ``*_udf``.
"""

from fstd2pandas_spark.functions.codecs import (
    stamp_to_timestamp,
    timestamp_to_stamp,
    stamp_from_raw,
    raw_from_stamp,
    decode_ip_value,
    decode_ip_kind,
    encode_ip,
    encode_ip_expr,
    decode_ip_py,
    encode_ip_py,
    stamp_to_datetime_py,
    datetime_to_stamp_py,
    forecast_hour_seconds,
)
from fstd2pandas_spark.functions.meta import (
    grid_identifier,
    parsed_etiket,
    typvar_flags,
    data_type_str,
    kind_str,
    is_surface,
    follows_topography,
    level_ascending,
    interval_struct,
    with_decoded_columns,
)

__all__ = [
    "stamp_to_timestamp", "timestamp_to_stamp", "stamp_from_raw",
    "raw_from_stamp", "decode_ip_value", "decode_ip_kind", "encode_ip",
    "encode_ip_expr", "decode_ip_py", "encode_ip_py",
    "stamp_to_datetime_py", "datetime_to_stamp_py", "forecast_hour_seconds",
    "grid_identifier", "parsed_etiket", "typvar_flags", "data_type_str",
    "kind_str", "is_surface", "follows_topography", "level_ascending",
    "interval_struct", "with_decoded_columns",
]
