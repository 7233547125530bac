from fstd2pandas_spark.plans.snapshot import (
    changed_partitions,
    partition_fingerprints,
)
from fstd2pandas_spark.plans.incremental import (
    incremental_refresh,
    partial_aggregates,
    reduce_partials,
)
from fstd2pandas_spark.plans.merge import (
    change_feed,
    merge_upsert,
    scd2_apply,
    scd2_lookup,
)
from fstd2pandas_spark.plans.compaction import (
    compact_partitions,
    compaction_plan,
    expire_partitions,
    recover_compaction,
)
from fstd2pandas_spark.plans.salting import key_skew_report, salted_join
from fstd2pandas_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    count_exchanges,
    plan_string,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "changed_partitions",
    "compact_partitions",
    "compaction_plan",
    "expire_partitions",
    "recover_compaction",
    "partition_fingerprints",
    "incremental_refresh",
    "key_skew_report",
    "change_feed",
    "merge_upsert",
    "salted_join",
    "partial_aggregates",
    "reduce_partials",
    "scd2_apply",
    "scd2_lookup",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "count_exchanges",
    "plan_string",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
