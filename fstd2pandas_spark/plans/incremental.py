"""Incremental aggregate maintenance — recompute only what changed.

This is the other half of the incremental-processing story started by
:mod:`fstd2pandas_spark.plans.snapshot`: fingerprints tell you WHICH
partitions moved; this module lets a materialized aggregate be PATCHED
from only those partitions instead of re-aggregated from the world.
The pattern is the classic partial-aggregate materialized view
(Hive/BigQuery incremental MV maintenance):

1. Maintain a partials table keyed by ``(part_cols, group_cols)`` —
   one row per (partition, group), holding the distributive state
   (row count + integer sums). Partitions-x-groups sized: kilobytes
   to megabytes where the facts are terabytes.
2. On refresh, drop the partials of changed/deleted partitions, scan
   ONLY new/changed partitions of the current corpus to rebuild their
   partials, and union with the untouched majority.
3. The final aggregate is a re-reduce of the partials over
   ``group_cols`` — the same vector-addition mergeability contract as
   :func:`~fstd2pandas_spark.operators.sketch.histogram_merge`.

Scale shape: the refresh scan is the only fact-table touch, and it is
restricted to changed partitions — when the changed-key set is small
(the steady-state case) the filter is a LITERAL predicate, so Catalyst
partition-prunes the parquet scan itself (``PartitionFilters`` /
``PushedFilters``): unchanged data is never read, not merely filtered
after the read. Past :data:`MAX_PRUNE_PARTITIONS` keys the literal
predicate would bloat the plan, so the filter degrades to a BROADCAST
left-semi join — still correct, still one scan, just without static
pruning. The keep-side anti join runs on the partials table
(partitions-sized), never on facts.

Determinism contract: counts and integer sums only — associative,
order-free, engine-free (the :func:`~fstd2pandas_spark.operators
.linfit.group_linfit` contract: float metrics must be quantized by
the caller). Non-integer sum columns raise at plan-build time.
Overflow is LOUD, not silent (the fingerprint/linfit convention):
each summed value carries an in-plan ``|v| <= MAX_SUM_ABS`` raise and
each partial's row count an ``n <= MAX_GROUP_ROWS`` raise, so a
partial sum can never wrap int64 (``2^31 rows x 2^31 max-abs = 2^62 <
2^63``); :func:`reduce_partials` re-checks the TOTAL row count against
the same bound, extending the no-wrap guarantee to the final reduce.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: literal-pruning ceiling: up to this many changed partition keys the
#: refresh filter is a literal OR-chain (Catalyst partition-prunes the
#: scan); beyond it the predicate would dominate plan analysis time, so
#: the filter degrades to a broadcast left-semi join (correct, one
#: scan, no static pruning).
MAX_PRUNE_PARTITIONS = 10_000

#: per-value magnitude bound for the integer sums (in-plan raise): with
#: ``|v| <= 2^31`` and ``n <= MAX_GROUP_ROWS`` per group, a partial sum
#: is bounded by 2^62 — inside int64 by construction.
MAX_SUM_ABS = 2 ** 31

#: per-group row-count bound (in-plan raise) — the
#: :data:`~fstd2pandas_spark.plans.snapshot.MAX_PARTITION_ROWS`
#: convention: past 2^31 rows the no-wrap headroom is gone and a
#: non-ANSI overflow would be SILENT; refuse loudly instead.
MAX_GROUP_ROWS = 2 ** 31

_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def _guarded_count(what: str, n: "Column | None" = None,
                   verb: str = "holds") -> Column:
    """Row count with the loud no-wrap bound (see module docstring) —
    one definition serving both the per-partial build and the final
    reduce, so a bound or message change can never miss one."""
    n = (F.count("*") if n is None else n).cast("long")
    bad = F.concat(
        F.lit(f"{what}: a group {verb} "), n.cast("string"),
        F.lit(f" rows > MAX_GROUP_ROWS={MAX_GROUP_ROWS} — the int64 "
              "sums lose their no-wrap headroom and a non-ANSI "
              "overflow would be silent; aggregate on a finer key"))
    return (F.when(n <= F.lit(MAX_GROUP_ROWS), n)
            .otherwise(F.raise_error(bad).cast("long")))


def _check_int_cols(df: DataFrame, sum_cols: "list[str]") -> None:
    types = dict(df.dtypes)
    for c in sum_cols:
        if types.get(c) not in _INT_TYPES:
            raise ValueError(
                f"{c} must be an integer column (got {types.get(c)}) — "
                "quantize floats first: implicit float sums are "
                "summation-order-dependent (the group_linfit contract)")


def _guarded_sum(c: str) -> Column:
    v = F.col(c).cast("long")
    bad = F.concat(
        F.lit(f"partial_aggregates: {c} = "),
        v.cast("string"),
        F.lit(f" exceeds MAX_SUM_ABS={MAX_SUM_ABS} in magnitude — the "
              "partial sum could wrap int64 silently; rescale the "
              "quantization"))
    # two-sided compare, NOT abs(): non-ANSI abs(Long.MIN_VALUE) wraps
    # to Long.MIN_VALUE itself, which would slip under the bound — the
    # exact silent overflow this guard exists to prevent
    v_ok = (F.when(v.isNull()
                   | ((v >= F.lit(-MAX_SUM_ABS)) & (v <= F.lit(MAX_SUM_ABS))),
                   v)
            .otherwise(F.raise_error(bad).cast("long")))
    return F.sum(v_ok).cast("long").alias(f"sum_{c}")


def partial_aggregates(df: DataFrame, part_cols: "list[str]",
                       group_cols: "list[str]",
                       sum_cols: "list[str]") -> DataFrame:
    """Build/rebuild the partials table: one row per
    ``(*part_cols, *group_cols)`` with ``n_rows`` plus ``sum_<c>`` for
    each integer metric (NULL metric values are skipped by the sum,
    counted by ``n_rows`` — both engines agree). ONE map-side-
    combinable aggregation over the fact table."""
    if not part_cols or not group_cols:
        raise ValueError("need at least one partition and group column")
    _check_int_cols(df, sum_cols)
    keys = list(part_cols) + list(group_cols)
    reserved = {"n_rows"} | {f"sum_{c}" for c in sum_cols}
    clash = reserved & set(keys)
    if clash:
        raise ValueError(
            f"key columns {sorted(clash)} collide with the partials "
            "output names — rename them first")
    return df.groupBy(*keys).agg(
        _guarded_count("partial_aggregates").alias("n_rows"),
        *[_guarded_sum(c) for c in sum_cols])


def _literal_touch_filter(part_cols: "list[str]",
                          rows: "list") -> Column:
    """OR-of-AND literal predicate over the touched partition keys —
    what lets Catalyst statically prune the refresh scan. NULL keys
    compare via isNull (a literal can't eqNullSafe a Python None)."""
    if not rows:
        return F.lit(False)

    def one(row) -> Column:
        terms = [F.col(c).isNull() if row[c] is None
                 else (F.col(c) == F.lit(row[c])) for c in part_cols]
        return functools.reduce(lambda x, y: x & y, terms)

    return balanced_any([one(r) for r in rows])


def balanced_any(terms: list):
    """OR of Column terms as a BALANCED tree. ``functools.reduce``
    builds a left-deep chain whose depth equals ``len(terms)`` —
    Catalyst's recursive analysis stack-overflows on ten-thousand-deep
    chains long before the MAX_PRUNE_PARTITIONS cap; log-depth keeps
    identical semantics (incl. NULL three-valued logic) at any cap.
    Shared with plans/compaction.py (one definition)."""
    if not terms:
        raise ValueError("balanced_any: need at least one term")
    if len(terms) == 1:
        return terms[0]
    mid = len(terms) // 2
    return balanced_any(terms[:mid]) | balanced_any(terms[mid:])


def incremental_refresh(current: DataFrame, old_partials: DataFrame,
                        diff: DataFrame, part_cols: "list[str]",
                        group_cols: "list[str]",
                        sum_cols: "list[str]",
                        prune_limit: int = MAX_PRUNE_PARTITIONS,
                        ) -> DataFrame:
    """Patch a partials table from a
    :func:`~fstd2pandas_spark.plans.snapshot.changed_partitions` diff:
    keep the partials of untouched partitions (null-safe anti join on
    the partitions-sized diff), rebuild new/changed partitions from
    ``current`` (the ONLY fact-table scan — literal-pruned when the
    touched-key set fits ``prune_limit``, broadcast-semi-joined past
    it), drop deleted ones. The result is bit-identical to
    ``partial_aggregates(current, ...)`` — that equivalence is the
    correctness oracle — while reading only changed partitions."""
    if "status" not in diff.columns:
        raise ValueError("diff must come from changed_partitions "
                         "(missing the status column)")
    internal = {f"_d{i}" for i in range(len(part_cols))} | \
               {f"_t{i}" for i in range(len(part_cols))}
    clash = internal & (set(current.columns) | set(old_partials.columns))
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with "
            "incremental_refresh's internal join-key names — rename "
            "them first (the _salted_topk reserved-name convention)")
    # materialize the partitions-sized diff ONCE: its lineage usually
    # runs two full fingerprint scans of the facts, and three
    # consumers read it below (the touched-key take, the keep anti
    # join, the fallback semi join) — without the cut each would
    # re-run those scans, defeating the "only fact-table scan is the
    # pruned rebuild" contract. localCheckpoint is the right tool for
    # a kilobytes-sized frame (callers on preemptible fleets can
    # df.checkpoint the diff reliably before passing it in).
    dkeys = diff.select(*part_cols, "status").localCheckpoint(eager=True)
    # keep: untouched partitions — ANY diff status invalidates the
    # old partial ('new' matches nothing in old_partials anyway).
    # Renamed-key frames keep the null-safe conditions unambiguous
    # (the changed_partitions convention).
    anykeys = F.broadcast(dkeys.select(
        *[F.col(c).alias(f"_d{i}") for i, c in enumerate(part_cols)]
    ).distinct())
    keep = old_partials.join(
        anykeys,
        functools.reduce(
            lambda x, y: x & y,
            [F.col(c).eqNullSafe(F.col(f"_d{i}"))
             for i, c in enumerate(part_cols)]),
        "left_anti")
    # rebuild: new/changed partitions only
    touched = (dkeys.filter(F.col("status").isin("new", "changed"))
               .select(*part_cols).distinct())
    rows = touched.take(prune_limit + 1)
    if len(rows) <= prune_limit:
        scan = current.filter(
            _literal_touch_filter(part_cols, rows))
    else:
        tkeys = F.broadcast(touched.select(
            *[F.col(c).alias(f"_t{i}") for i, c in enumerate(part_cols)]))
        scan = current.join(
            tkeys,
            functools.reduce(
                lambda x, y: x & y,
                [F.col(c).eqNullSafe(F.col(f"_t{i}"))
                 for i, c in enumerate(part_cols)]),
            "left_semi")
    rebuilt = partial_aggregates(scan, part_cols, group_cols, sum_cols)
    return keep.unionByName(rebuilt)


def reduce_partials(partials: DataFrame, group_cols: "list[str]",
                    sum_cols: "list[str]") -> DataFrame:
    """Final aggregate from the partials alone — vector addition over
    ``group_cols``, never touching facts. The total row count re-checks
    the :data:`MAX_GROUP_ROWS` no-wrap bound (with per-value magnitude
    already bounded at build time, a total under 2^31 rows keeps every
    sum inside int64 by construction)."""
    if not group_cols:
        raise ValueError("need at least one group column")
    return partials.groupBy(*group_cols).agg(
        _guarded_count("reduce_partials", n=F.sum("n_rows"),
                       verb="totals").alias("n_rows"),
        *[F.sum(f"sum_{c}").cast("long").alias(f"sum_{c}")
          for c in sum_cols])
