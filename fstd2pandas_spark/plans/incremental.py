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


def _check_partials_schema(partials: DataFrame, key_cols: "list[str]",
                           sum_cols: "list[str]", who: str) -> None:
    """Crisp fail-at-call validation of a partials-table input — the
    adoption-path guard class: a hand-built/drifted partials table
    with a DOUBLE ``sum_<c>`` column would silently float-widen the
    whole refreshed table through ``unionByName`` (breaking the
    integer determinism contract with no error), and a missing column
    dies as an opaque AnalysisException deep in the plan."""
    have = dict(partials.dtypes)
    state = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
    missing = [c for c in [*key_cols, *state] if c not in have]
    if missing:
        raise ValueError(
            f"{who}: columns {missing} not in the partials schema "
            f"{sorted(have)} — partials tables come from "
            "partial_aggregates (or must match its layout)")
    drifted = [f"{c}: {have[c]}" for c in state
               if have[c] not in _INT_TYPES]
    if drifted:
        raise ValueError(
            f"{who}: partials state columns must be integers, got "
            f"{drifted} — a float column would make the refreshed "
            "table summation-order-dependent (unionByName silently "
            "widens long vs double to double); rebuild the partials "
            "via partial_aggregates")


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
                        check_unique: bool = False) -> DataFrame:
    """Patch a partials table from a
    :func:`~fstd2pandas_spark.plans.snapshot.changed_partitions` diff:
    keep the partials of untouched partitions (null-safe anti join on
    the partitions-sized diff), rebuild new/changed partitions from
    ``current`` (the ONLY fact-table scan — literal-pruned when the
    touched-key set fits ``prune_limit``, broadcast-semi-joined past
    it), drop deleted ones. The result is bit-identical to
    ``partial_aggregates(current, ...)`` — that equivalence is the
    correctness oracle — while reading only changed partitions.

    A diff row whose status is not new/changed/deleted is REFUSED
    (it would silently fall between 'drop the old partial' and
    'rebuild', deleting that partition's data from the partials).
    ``check_unique=True`` is the ADOPTION-path guard (the
    ``check_target_unique`` sibling): a hand-built partials table
    holding duplicate (partition, group) rows passes the keep
    anti-join untouched and double-counts every reduce — the opt-in
    window raises in-plan naming the key; partials built by
    :func:`partial_aggregates` are unique by construction."""
    if "status" not in diff.columns:
        raise ValueError("diff must come from changed_partitions "
                         "(missing the status column)")
    # fail-at-call BEFORE the eager diff materialization below — its
    # lineage usually runs two full fingerprint scans of the facts,
    # and a typo'd column must not cost a terabyte scan first
    _require = [c for c in [*part_cols, *group_cols, *sum_cols]
                if c not in current.columns]
    if _require:
        raise ValueError(
            f"incremental_refresh: columns {_require} not in the "
            f"current corpus schema {sorted(current.columns)}")
    _check_int_cols(current, sum_cols)
    _check_partials_schema(old_partials,
                           [*part_cols, *group_cols], sum_cols,
                           "incremental_refresh")
    internal = {f"_d{i}" for i in range(len(part_cols))} | \
               {f"_t{i}" for i in range(len(part_cols))}
    clash = internal & (set(current.columns) | set(old_partials.columns))
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with "
            "incremental_refresh's internal join-key names — rename "
            "them first (the _salted_topk reserved-name convention)")
    if check_unique:
        from pyspark.sql import Window

        wdup = Window.partitionBy(*part_cols, *group_cols)
        dup_bad = F.concat(
            F.lit("incremental_refresh: old_partials holds duplicate "
                  "(partition, group) rows for ("),
            F.concat_ws(", ", *[
                F.coalesce(F.col(k).cast("string"), F.lit("NULL"))
                for k in [*part_cols, *group_cols]]),
            F.lit(") — an adopted/hand-built partials table "
                  "double-counts every untouched partition on each "
                  "reduce; deduplicate or rebuild it first"))
        # rides n_rows (always selected into keep) — a guard-only
        # column would be pruned away with the column
        old_partials = old_partials.withColumn(
            "n_rows",
            F.when(F.count("*").over(wdup) == 1, F.col("n_rows"))
            .otherwise(F.raise_error(dup_bad).cast("long")))
    # materialize the partitions-sized diff ONCE: its lineage usually
    # runs two full fingerprint scans of the facts, and three
    # consumers read it below (the touched-key take, the keep anti
    # join, the fallback semi join) — without the cut each would
    # re-run those scans, defeating the "only fact-table scan is the
    # pruned rebuild" contract. localCheckpoint is the right tool for
    # a kilobytes-sized frame (callers on preemptible fleets can
    # df.checkpoint the diff reliably before passing it in).
    dkeys = diff.select(*part_cols, "status").localCheckpoint(eager=True)
    # a status outside the changed_partitions vocabulary would fall
    # BETWEEN 'drop the old partial' (anykeys matches every status)
    # and 'rebuild' (touched filters new/changed) — silently deleting
    # that partition's data from the partials; refuse instead. One
    # tiny job on the kilobytes-sized checkpointed frame.
    bad_status = [r["status"] for r in
                  dkeys.filter(~F.col("status").isin(
                      "new", "changed", "deleted"))
                  .select("status").distinct().take(4)]
    if bad_status:
        raise ValueError(
            f"incremental_refresh: diff carries unknown status values "
            f"{bad_status} — only new/changed/deleted (the "
            "changed_partitions vocabulary) are applicable; anything "
            "else would silently DELETE that partition's partials")
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
    ``group_cols``, never touching facts. The no-wrap guarantee holds
    for HAND-BUILT partials too, not just partial_aggregates output:
    each partial row must carry ``0 <= n_rows <= MAX_GROUP_ROWS`` and
    ``|sum_<c>| <= n_rows * MAX_SUM_ABS`` (raised in-plan riding the
    summed columns — what a legitimate build can produce), which
    bounds every total by ``MAX_GROUP_ROWS * MAX_SUM_ABS = 2^62``
    once the total row count re-checks :data:`MAX_GROUP_ROWS`."""
    if not group_cols:
        raise ValueError("need at least one group column")
    _check_partials_schema(partials, group_cols, sum_cols,
                           "reduce_partials")
    nr = F.col("n_rows").cast("long")
    n_bad = F.concat(
        F.lit("reduce_partials: a partial row carries n_rows = "),
        F.coalesce(nr.cast("string"), F.lit("NULL")),
        F.lit(f" outside [0, MAX_GROUP_ROWS={MAX_GROUP_ROWS}] — a "
              "hand-built partials row voids the no-wrap bound; "
              "rebuild via partial_aggregates"))
    nr_ok = (F.when((nr >= 0) & (nr <= F.lit(MAX_GROUP_ROWS)), nr)
             .otherwise(F.raise_error(n_bad).cast("long")))

    def s_ok(c: str) -> Column:
        v = F.col(f"sum_{c}").cast("long")
        cap = nr_ok * F.lit(MAX_SUM_ABS)
        bad = F.concat(
            F.lit(f"reduce_partials: sum_{c} = "), v.cast("string"),
            F.lit(" exceeds its partial's n_rows * MAX_SUM_ABS "
                  "envelope — no legitimate build can produce it, and "
                  "a hand-built value this large could wrap the total "
                  "silently under non-ANSI configs; rebuild via "
                  "partial_aggregates"))
        return (F.sum(F.when(v.isNull() | ((v >= -cap) & (v <= cap)),
                             v)
                      .otherwise(F.raise_error(bad).cast("long")))
                .cast("long").alias(f"sum_{c}"))

    return partials.groupBy(*group_cols).agg(
        _guarded_count("reduce_partials", n=F.sum(nr_ok),
                       verb="totals").alias("n_rows"),
        *[s_ok(c) for c in sum_cols])
