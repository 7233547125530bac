from fstd2pandas_spark.streaming.cdc_sink import (
    apply_cdc_stream,
    cdc_changes,
    read_cdc_table,
    vacuum_generations,
)
from fstd2pandas_spark.streaming.record_stream import (
    DEDUP_KEYS,
    cycle_window_stats,
    read_document_stream,
    read_record_stream,
    run_to_memory,
    running_extrema,
    streaming_drop_duplicates,
    streaming_exact_dedup,
    streaming_funnel,
    streaming_interval_join,
    streaming_signature_dedup,
)

__all__ = [
    "DEDUP_KEYS",
    "apply_cdc_stream",
    "cdc_changes",
    "read_cdc_table",
    "vacuum_generations",
    "cycle_window_stats",
    "read_document_stream",
    "read_record_stream",
    "run_to_memory",
    "running_extrema",
    "streaming_drop_duplicates",
    "streaming_exact_dedup",
    "streaming_funnel",
    "streaming_interval_join",
    "streaming_signature_dedup",
]
