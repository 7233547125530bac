"""CDC MERGE / upsert — apply a change batch to a key-addressed table.

The write-side companion of :mod:`~fstd2pandas_spark.plans.snapshot` /
:mod:`~fstd2pandas_spark.plans.incremental`: those decide WHAT to
reprocess; this applies a change-data-capture batch (upserts +
tombstones, possibly several versions of one key) to a base table —
the Delta/Iceberg ``MERGE INTO`` semantics expressed as plain
DataFrame ops, so the result is an ordinary frame any sink can write.

Semantics (deterministic by construction):

1. The source batch is resolved to ONE row per key, latest-wins by
   ``version_col`` (a monotone CDC sequence — LSN, binlog offset,
   ingest version). EXACT duplicate rows collapse first — an
   at-least-once delivery replaying the same change is idempotent,
   not an error. After that, two source rows sharing (key, max
   version) genuinely DIVERGE and raise in-plan — row_number
   tie-breaking would pick a physical row nondeterministically, the
   exact wrongness the engine's bit-determinism contract forbids.
   Without ``version_col`` the deduplicated batch must be key-unique
   (raised otherwise, same reason).
2. A resolved row with ``delete_col`` true is a tombstone: the key
   disappears from the output.
3. A matched key takes the source payload ENTIRELY (a NULL in the
   source is "set NULL", the SQL MERGE rule — matching on a presence
   flag, never on value non-nullness); an unmatched source key is an
   insert; an untouched target row passes through.

Scale shape: ONE window over the CDC batch (batch-sized, one
exchange) and ONE null-safe full-outer key join. A broadcast-hash
full outer does not exist in Spark, so the target-side key exchange
is the irreducible cost of a key-addressed rewrite — Delta's MERGE
pays the same shuffle; a target bucketed on the keys
(plans/bucketing.py) joined with ``keys_not_null=True`` makes the
target side exchange-free (plan-locked) — the DEFAULT null-safe
``<=>`` join extracts to ``(coalesce(k, default), isnull(k))`` join
keys, which no bucket layout on bare ``k`` satisfies, so without the
flag even a bucketed target re-shuffles (measured). AQE coalesces
the usually-tiny CDC side. Key skew is the generic salting problem
(plans/salting.py).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PREFIX = "_mrg_"

_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def _guard_prefix(cols, who: str) -> None:
    """One definition of the reserved-namespace check (third copy was
    drifting — the _resolve_latest precedent)."""
    clash = sorted(c for c in cols if c.startswith(_PREFIX))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with {who}'s internal "
            f"'{_PREFIX}*' names — rename them first")


def _require_int(df: DataFrame, c: str, who: str) -> None:
    """One definition of the integer-clock enforcement: a silent long
    cast would truncate fractional versions (de-syncing guards from
    the latest-wins rank order) and cross-cast strings to NULL;
    quantize timestamp clocks to epoch units first (the group_linfit
    contract)."""
    t = dict(df.dtypes).get(c)
    if t not in _INT_TYPES:
        raise ValueError(
            f"{who}: {c} must be an integer column (got {t}) — "
            "quantize timestamp/float clocks to integer epoch units "
            "first; a silent cast would truncate or NULL values")


def _key_eq(keys: "list[str]", null_safe: bool = True,
            left_prefix: str = "", right_prefix: str = "_mrg_k_"):
    """Equality between (possibly prefixed) key-column aliases — the
    ONE join-condition builder, prefix-parameterized so the
    check_reinserts anti-join/broadcast conditions use it too instead
    of hand-rolled copies. Null-safe by default; plain ``==`` under
    ``keys_not_null`` (see merge_upsert: ``<=>`` extracts to
    ``(coalesce(k, default), isnull(k))`` join keys, which no
    bucket/partition layout on bare ``k`` can satisfy, so the
    null-safe form always re-shuffles a bucketed target)."""
    if null_safe:
        pairs = [F.col(f"{left_prefix}{k}")
                 .eqNullSafe(F.col(f"{right_prefix}{k}"))
                 for k in keys]
    else:
        pairs = [F.col(f"{left_prefix}{k}") == F.col(f"{right_prefix}{k}")
                 for k in keys]
    return functools.reduce(lambda x, y: x & y, pairs)


def _key_repr(keys: "list[str]"):
    """Key values for in-plan error messages, NULLs spelled as the
    literal 'NULL' — ``concat_ws`` SKIPS NULL components, so a
    composite key (NULL, 2) would render indistinguishably from
    (2, NULL) and a single NULL key as '()' (the
    grouped_quality_report precedent, validation.py)."""
    return F.concat_ws(", ", *[
        F.coalesce(F.col(k).cast("string"), F.lit("NULL"))
        for k in keys])


def _require_cols(df: DataFrame, cols, who: str, side: str) -> None:
    """Crisp fail-at-call for misspelled column names — without this
    a typo'd key or version column dies as an opaque
    AnalysisException deep inside the join/window construction."""
    have = set(df.columns)
    missing = [c for c in cols if c is not None and c not in have]
    if missing:
        raise ValueError(
            f"{who}: columns {missing} not in the {side} schema "
            f"{sorted(have)}")


#: types whose ordering matches CDC-sequence intent; STRING is the
#: trap — '9' > '10' lexicographically, so a stale row would WIN
#: latest-wins resolution silently
_VERSION_TYPE_PREFIXES = ("tinyint", "smallint", "int", "bigint",
                          "float", "double", "decimal", "date",
                          "timestamp")


def _require_version_type(df: DataFrame, c: str, who: str) -> None:
    t = dict(df.dtypes).get(c, "")
    if not t.startswith(_VERSION_TYPE_PREFIXES):
        raise ValueError(
            f"{who}: version_col {c} has type {t} — latest-wins needs "
            "a numerically/temporally ordered type; a STRING version "
            "orders lexicographically ('9' > '10') and would silently "
            "apply stale rows. Cast the column first")


def _null_key_guard(keys: "list[str]", cols, who: str, side: str):
    """In-plan raise when any key column is NULL under
    ``keys_not_null=True`` — a NULL key never matches a plain
    equi-join, so the row would silently split into an orphan
    pass-through + a spurious insert instead of matching."""
    any_null = functools.reduce(
        lambda x, y: x | y, [c.isNull() for c in cols])
    bad = F.lit(
        f"{who}: NULL key in the {side} under keys_not_null=True — "
        "a NULL key never matches a plain equi-join and the row "
        "would silently mis-merge; use keys_not_null=False or "
        "repair the keys")
    return any_null, bad


def _widen(df: DataFrame, ref: DataFrame,
           skip: "set[str] | frozenset" = frozenset()) -> DataFrame:
    """One definition of the schema-evolution NULL-widen (the third
    copy was forming — the _guard_prefix precedent): append ``ref``'s
    columns missing from ``df`` as typed NULLs, in ``ref`` order."""
    have = set(df.columns)
    for c in ref.columns:
        if c not in have and c not in skip:
            df = df.withColumn(c, F.lit(None).cast(ref.schema[c].dataType))
    return df


def _resolve_latest(source: DataFrame, keys: "list[str]",
                    version_col: "str | None", who: str):
    """Shared CDC batch resolution (merge_upsert + scd2_apply — one
    definition, the _salted_topk precedent): collapse exact duplicates
    (at-least-once replays are idempotent), keep the max-version row
    per key, and return ``(resolved, bad)`` where ``resolved`` carries
    ``_mrg_dup`` (the count of surviving max-version rows) and ``bad``
    is the ambiguity error message — each caller folds the
    ``_mrg_dup == 1`` guard into one of its own ALWAYS-SELECTED
    columns (a guard-only column would be pruned away with the
    column). Both windows share the key partitioning: one exchange
    over the batch."""
    source = source.dropDuplicates()
    wk = Window.partitionBy(*keys)
    if version_col is not None:
        rk = F.rank().over(wk.orderBy(F.col(version_col).desc()))
        why = "two source rows share (key, max version)"
    else:
        rk = F.lit(1)
        why = "the batch has duplicate keys and no version_col"
    bad = F.concat(
        F.lit(f"{who}: ambiguous CDC batch — {why} for key ("),
        _key_repr(keys),
        F.lit(")"))
    dup = F.sum(F.when(F.col("_mrg_rk") == 1, 1).otherwise(0)).over(wk)
    resolved = (source
                .withColumn("_mrg_rk", rk)
                .withColumn("_mrg_dup", dup)
                .filter(F.col("_mrg_rk") == 1))
    return resolved, bad


def merge_upsert(target: DataFrame, source: DataFrame,
                 keys: "list[str]", version_col: "str | None" = None,
                 delete_col: "str | None" = None,
                 keys_not_null: bool = False,
                 new_columns: str = "error",
                 check_target_unique: bool = False) -> DataFrame:
    """MERGE ``source`` (a CDC batch) into ``target``; returns the new
    table with the target's column order. See the module docstring
    for the exact update/insert/delete/latest-wins contract. A
    resolved row whose ``version_col`` is NULL raises in-plan (it can
    only win resolution when the key carries no non-NULL version at
    all — an undefined CDC sequence position must not be applied
    silently; the scd2_apply mirror).

    ``keys_not_null=True`` is the bucketed-target fast path: the
    default null-safe ``<=>`` join extracts to ``(coalesce(k,
    default), isnull(k))`` join keys — an EXPRESSION no bucket layout
    on bare ``k`` can satisfy, so the target always re-shuffles
    (measured; the plan lock in tests/test_plans.py pins both
    shapes). With the flag, the join keys are the bare key columns,
    a target bucketed on them (plans/bucketing.py) joins with ZERO
    target-side exchange — only the tiny CDC side shuffles into the
    bucket layout — and a NULL key on either side raises in-plan
    (riding the always-selected presence flags) instead of silently
    mis-merging as orphan + spurious insert.

    ``new_columns`` is the schema-evolution knob (the Delta
    ``mergeSchema``/autoMerge semantics, opt-in): ``"error"`` (the
    default) refuses ANY drift loudly; ``"add"`` lets the source
    carry EXTRA payload columns — the target schema GAINS them
    (appended after the existing columns, in source order, with the
    source's types) and every target row the batch does not touch
    reads NULL there, exactly what a column that did not exist when
    the row was written means. Source columns MISSING from the target
    stay an error under either mode: MERGE replaces whole rows, so a
    value for an unsupplied column cannot be fabricated — project the
    target first if a column is being dropped.

    ``check_target_unique=True`` is the ADOPTION-path guard: a target
    not built by this suite may hold duplicate keys, which fan out
    through the merge join and get AMPLIFIED on every batch; the
    opt-in window raises in-plan naming the key. Opt-in because it
    costs one bare-key exchange over the BULK side under the default
    null-safe join (a bucketed target under ``keys_not_null`` serves
    it from the layout); tables maintained by this merge are
    key-unique by construction."""
    if not keys:
        raise ValueError("need at least one key column")
    if new_columns not in ("error", "add"):
        raise ValueError(
            f"new_columns must be 'error' or 'add', got {new_columns!r}")
    _guard_prefix(set(target.columns) | set(source.columns),
                  "merge_upsert")
    _require_cols(target, keys, "merge_upsert", "target")
    _require_cols(source, [*keys, version_col, delete_col],
                  "merge_upsert", "source")
    if version_col is not None:
        _require_version_type(source, version_col, "merge_upsert")
    meta = {c for c in (version_col, delete_col) if c}
    if new_columns == "add":
        missing = set(target.columns) - (set(source.columns) - meta)
        if missing:
            raise ValueError(
                "source payload lacks target columns "
                f"{sorted(missing)} — MERGE replaces whole rows, so a "
                "value for an unsupplied column cannot be fabricated; "
                "new_columns='add' only ADDS source columns, it never "
                "drops target ones (project the target first)")
        target = _widen(target, source, skip=meta)
    if set(target.columns) != set(source.columns) - meta:
        raise ValueError(
            "source payload columns must equal the target schema "
            f"(target {sorted(target.columns)} vs source-minus-meta "
            f"{sorted(set(source.columns) - meta)}) — MERGE replaces "
            "whole rows; project both sides first (or pass "
            "new_columns='add' to let the schema evolve)")

    resolved, bad = _resolve_latest(source, keys, version_col,
                                    "merge_upsert")

    payload = [c for c in target.columns if c not in keys]
    # a resolved row whose version is NULL has an UNDEFINED CDC
    # sequence position (rank desc orders NULLS LAST, so it can only
    # win when the key carries no non-NULL version at all) — raise
    # in-plan instead of silently applying it, mirroring scd2_apply's
    # NULL-version guard; rides the same always-selected flag. A
    # floating-point version's NaN is the SIBLING trap: Spark orders
    # NaN GREATER than every number, so a NaN version silently WINS
    # latest-wins resolution (the string trap's smaller sibling —
    # '9' > '10' is refused at call time, NaN is caught here on the
    # same load-bearing flag)
    ver_null = (F.col(version_col).isNull() if version_col
                else F.lit(False))
    ver_word = "NULL"
    if version_col is not None and dict(source.dtypes)[
            version_col].startswith(("float", "double")):
        ver_null = ver_null | F.isnan(F.col(version_col))
        ver_word = "NULL/NaN"
    ver_bad = F.concat(
        F.lit(f"merge_upsert: {ver_word} version for key ("),
        _key_repr(keys),
        F.lit(") — an undefined CDC sequence position cannot be "
              "latest-wins resolved (a NaN version orders GREATER "
              "than every number and would silently win); repair the "
              "batch first"))
    # the ambiguity raise rides the always-selected presence flag —
    # on a guard-only column Catalyst would prune it away with the
    # column (the plan-lock lesson: a loud guard must be load-bearing)
    if keys_not_null:
        snull, s_bad = _null_key_guard(
            keys, [F.col(k) for k in keys], "merge_upsert", "source")
        tnull, t_bad = _null_key_guard(
            keys, [F.col(k) for k in keys], "merge_upsert", "target")
        tgt_flag = (F.when(tnull, F.raise_error(t_bad).cast("boolean"))
                    .otherwise(F.lit(True)))
    else:
        snull, s_bad = F.lit(False), F.lit("")
        tgt_flag = F.lit(True)
    if check_target_unique:
        # the ADOPTION-path guard: a pre-existing duplicate-key target
        # fans out through the merge join and every batch AMPLIFIES
        # the duplicates (the scd2 open-slice hazard, target-side).
        # Opt-in because the count window costs one bare-key exchange
        # over the BULK side under the default null-safe join (whose
        # own join keys are coalesce/isnull extractions); under
        # keys_not_null + a bucketed target the layout serves it.
        n_t = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        t_dup = F.concat(
            F.lit("merge_upsert: target holds "), n_t.cast("string"),
            F.lit(" rows for key ("), _key_repr(keys),
            F.lit(") — a duplicate-key target fans out through the "
                  "merge join and every batch amplifies it; dedupe "
                  "the target first"))
        tgt_flag = (F.when(n_t > 1,
                           F.raise_error(t_dup).cast("boolean"))
                    .otherwise(tgt_flag))
    src = resolved.select(
        *[F.col(k).alias(f"_mrg_k_{k}") for k in keys],
        *[F.col(c).alias(f"_mrg_v_{c}") for c in payload],
        # NULL tombstone flag means NOT deleted (the docstring
        # contract) — uncoalesced it would three-valued-logic the row
        # out of the post-join filter entirely
        (F.coalesce(F.col(delete_col), F.lit(False)) if delete_col
         else F.lit(False)).alias("_mrg_del"),
        F.when(F.col("_mrg_dup") != 1,
               F.raise_error(bad).cast("boolean"))
        .when(ver_null, F.raise_error(ver_bad).cast("boolean"))
        .when(snull, F.raise_error(s_bad).cast("boolean"))
        .otherwise(F.lit(True))
        .alias("_mrg_src"))
    j = target.withColumn("_mrg_tgt", tgt_flag) \
              .join(src, _key_eq(keys, null_safe=not keys_not_null),
                    "full_outer")
    hit = F.col("_mrg_src").isNotNull()
    out = (j.filter(~(hit & F.col("_mrg_del")))
           .select(
               *[F.when(F.col("_mrg_tgt").isNotNull(), F.col(k))
                 .otherwise(F.col(f"_mrg_k_{k}")).alias(k)
                 for k in keys],
               *[F.when(hit, F.col(f"_mrg_v_{c}"))
                 .otherwise(F.col(c)).alias(c) for c in payload]))
    return out.select(*target.columns)


def scd2_apply(history: DataFrame, batch: DataFrame,
               keys: "list[str]", version_col: str,
               valid_from: str = "valid_from",
               valid_to: str = "valid_to",
               delete_col: "str | None" = None,
               check_reinserts: bool = False,
               new_columns: str = "error") -> DataFrame:
    """Slowly-Changing-Dimension Type 2 maintenance — the versioned
    dimension table every warehouse keeps: instead of overwriting a
    changed row (MERGE), close the current version (``valid_to`` =
    the batch version) and append the new one open-ended
    (``valid_from`` = version, ``valid_to`` NULL), preserving full
    history for as-of joins.

    Semantics (deterministic; the batch resolves through the same
    latest-wins machinery as :func:`merge_upsert`):

    - matched key, payload IDENTICAL (null-safe column compare):
      NO-OP — change detection keeps an idempotent feed from growing
      history on every run, the property that makes daily full
      re-extracts cheap;
    - matched key, payload differs: close current + append new open
      version;
    - matched key, tombstone (``delete_col`` true): close current,
      append nothing;
    - new key (not a tombstone): append open version;
    - tombstone for an absent key: no-op;
    - already-closed history rows always pass through untouched.

    History corruption is LOUD: closing a row with a batch version
    not strictly greater than its ``valid_from`` raises in-plan
    (riding the emitted ``valid_to`` — load-bearing, never pruned):
    an out-of-order batch must not fabricate a non-monotone interval.
    A NULL batch version raises on the same guard (it would append an
    open row whose interval start is undefined and wedge every later
    close). A key holding TWO open rows — a corrupt current slice,
    e.g. a prior partial write — raises before the join instead of
    silently doubling history on every apply. ``version_col``,
    ``valid_from`` and ``valid_to`` must be integer columns (raised
    otherwise — the group_linfit contract: a silent long cast would
    truncate fractional versions and de-sync the monotone guard from
    the rank order; timestamp clocks quantize to epoch units first).

    One hazard is documented, not guarded by default: RE-INSERTING a
    previously tombstoned key with a version at or below the
    tombstone's close version would fabricate an interval overlapping
    closed history. Guarding it needs a scan of the CLOSED slice —
    the bulk of the table at steady state — every apply, so it is
    opt-in: ``check_reinserts=True`` aggregates max(valid_to) per
    GENUINELY tombstoned key — closed keys are anti-joined against
    the current slice's keys first (both frames keys-sized), because
    a supersede also closes a row and an idempotent replay of the
    batch that created the current open version must stay a no-op —
    then the keys-sized result broadcasts back and a stale re-insert
    raises. Tombstone rows are exempt (a delete re-inserts nothing,
    and replaying the batch that tombstoned the key must stay a
    fixpoint too).

    Scale shape: closed rows never join (a filter splits them off —
    at steady state they are the bulk of the table); one batch window
    + one null-safe full-outer key join against the CURRENT slice
    only, then a union — both output rows of a matched key come from
    ONE pass over the join (exploded struct pair).

    ``new_columns='add'`` is the same opt-in schema evolution as
    :func:`merge_upsert`: extra batch payload columns are appended to
    the history schema (batch types; every existing row — open AND
    closed history — reads NULL there). Change detection composes
    naturally: a batch row whose only difference is a non-NULL value
    in the new column closes and appends, one that is NULL there
    no-ops. Batch columns missing from the history payload stay an
    error under either mode."""
    if not keys:
        raise ValueError("need at least one key column")
    if new_columns not in ("error", "add"):
        raise ValueError(
            f"new_columns must be 'error' or 'add', got {new_columns!r}")
    _guard_prefix(set(history.columns) | set(batch.columns),
                  "scd2_apply")
    for c in (valid_from, valid_to):
        if c not in history.columns:
            raise ValueError(f"history lacks the {c} column")
    _require_cols(history, keys, "scd2_apply", "history")
    _require_cols(batch, [*keys, version_col, delete_col],
                  "scd2_apply", "batch")
    meta = {c for c in (version_col, delete_col) if c}
    if new_columns == "add":
        hist_payload = (set(history.columns)
                        - {valid_from, valid_to})
        missing = hist_payload - (set(batch.columns) - meta)
        if missing:
            raise ValueError(
                "batch payload lacks history columns "
                f"{sorted(missing)} — SCD2 appends whole versions, so "
                "a value for an unsupplied column cannot be "
                "fabricated; new_columns='add' only ADDS batch "
                "columns, it never drops history ones")
        history = _widen(history, batch, skip=meta)
    payload = [c for c in history.columns
               if c not in keys and c not in (valid_from, valid_to)]
    if set(keys) | set(payload) != set(batch.columns) - meta:
        raise ValueError(
            "batch payload columns must equal the history schema "
            f"minus {valid_from}/{valid_to} (history-derived "
            f"{sorted(set(keys) | set(payload))} vs batch-minus-meta "
            f"{sorted(set(batch.columns) - meta)}) — or pass "
            "new_columns='add' to let the schema evolve")

    for df_, c in ((batch, version_col), (history, valid_from),
                   (history, valid_to)):
        _require_int(df_, c, "scd2_apply")

    resolved, bad = _resolve_latest(batch, keys, version_col,
                                    "scd2_apply")
    # a NULL version has no interval start — raise here (load-bearing:
    # _mrg_ver feeds both emitted validity columns)
    ver_bad = F.concat(
        F.lit("scd2_apply: NULL batch version for key ("),
        _key_repr(keys),
        F.lit(") — an open row with an undefined interval start would "
              "wedge every later close"))
    src = resolved.select(
        *[F.col(k).alias(f"_mrg_k_{k}") for k in keys],
        *[F.col(c).alias(f"_mrg_v_{c}") for c in payload],
        F.when(F.col(version_col).isNotNull(),
               F.col(version_col).cast("long"))
        .otherwise(F.raise_error(ver_bad).cast("long"))
        .alias("_mrg_ver"),
        (F.coalesce(F.col(delete_col), F.lit(False)) if delete_col
         else F.lit(False)).alias("_mrg_del"),
        F.when(F.col("_mrg_dup") == 1, F.lit(True))
        .otherwise(F.raise_error(bad).cast("boolean"))
        .alias("_mrg_src"))

    closed = history.filter(F.col(valid_to).isNotNull())
    # a corrupt current slice (two open rows for one key) would be
    # silently AMPLIFIED by the join — raise instead, riding the
    # always-selected _mrg_tgt marker
    n_open = F.count("*").over(Window.partitionBy(*keys))
    open_bad = F.concat(
        F.lit("scd2_apply: history holds "), n_open.cast("string"),
        F.lit(" OPEN rows for key ("),
        _key_repr(keys),
        F.lit(") — a corrupt current slice would double on every "
              "apply; repair history first"))
    current = (history.filter(F.col(valid_to).isNull())
               .withColumn("_mrg_tgt",
                           F.when(n_open == 1, F.lit(True))
                           .otherwise(F.raise_error(open_bad)
                                      .cast("boolean"))))
    if check_reinserts:
        # the guard must only fire for keys with NO currently-open
        # row: max(valid_to) over ALL closed rows cannot distinguish
        # a tombstone close from a SUPERSEDE close, so without the
        # anti-join an idempotent replay of the batch that created
        # the current open version (ver == last close version) would
        # raise spuriously and break the documented fixpoint
        # contract. Both frames are keys-sized, so the anti-join is
        # trivial at any history size.
        open_keys = (history.filter(F.col(valid_to).isNull())
                     .select(*[F.col(k).alias(f"_mrg_o_{k}")
                               for k in keys]))
        tomb = (closed.groupBy(*keys)
                .agg(F.max(F.col(valid_to)).cast("long")
                     .alias("_mrg_tv"))
                .join(open_keys,
                      _key_eq(keys, right_prefix="_mrg_o_"),
                      "left_anti"))
        tv = tomb.select(
            *[F.col(k).alias(f"_mrg_t_{k}") for k in keys], "_mrg_tv")
        tcond = _key_eq(keys, left_prefix="_mrg_k_",
                        right_prefix="_mrg_t_")
        re_bad = F.concat(
            F.lit("scd2_apply: batch version "),
            F.col("_mrg_ver").cast("string"),
            F.lit(" re-inserts a key whose history was closed at "),
            F.col("_mrg_tv").cast("string"),
            F.lit(" — the open interval would overlap closed history"))
        # a TOMBSTONE row is exempt: it re-inserts nothing (a delete
        # for an already-closed key is the documented absent-key
        # no-op), and replaying the batch that tombstoned the key
        # (ver == the close version) must stay a fixpoint
        src = (src.join(F.broadcast(tv), tcond, "left")
               .withColumn(
                   "_mrg_ver",
                   F.when(F.col("_mrg_tv").isNull()
                          | (F.col("_mrg_ver") > F.col("_mrg_tv"))
                          | F.col("_mrg_del"),
                          F.col("_mrg_ver"))
                   .otherwise(F.raise_error(re_bad).cast("long")))
               .drop(*[f"_mrg_t_{k}" for k in keys], "_mrg_tv"))
    j = current.join(src, _key_eq(keys), "full_outer")
    hit = F.col("_mrg_src").isNotNull()
    present = F.col("_mrg_tgt").isNotNull()
    same = functools.reduce(
        lambda x, y: x & y,
        [F.col(c).eqNullSafe(F.col(f"_mrg_v_{c}")) for c in payload]) \
        if payload else F.lit(True)
    closing = hit & present & (~same | F.col("_mrg_del"))
    mono_bad = F.concat(
        F.lit("scd2_apply: batch version "),
        F.col("_mrg_ver").cast("string"),
        F.lit(f" is not greater than the open row's {valid_from} "),
        F.col(valid_from).cast("string"),
        F.lit(" — an out-of-order batch would fabricate a "
              "non-monotone validity interval"))
    close_ver = (F.when(F.col("_mrg_ver") > F.col(valid_from),
                        F.col("_mrg_ver"))
                 .otherwise(F.raise_error(mono_bad).cast("long")))
    # BOTH output rows (the kept/closed current row and the appended
    # new version) come out of ONE pass over the join via an exploded
    # struct pair — two filtered branches would re-evaluate the whole
    # batch-resolution + join subtree once each
    kept_s = F.when(present, F.struct(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(c) for c in payload],
        F.col(valid_from).cast("long").alias(valid_from),
        F.when(closing, close_ver).otherwise(F.lit(None).cast("long"))
        .alias(valid_to)))
    app_s = F.when(hit & ~F.col("_mrg_del") & (~present | ~same),
                   F.struct(
        *[F.col(f"_mrg_k_{k}").alias(k) for k in keys],
        *[F.col(f"_mrg_v_{c}").alias(c) for c in payload],
        F.col("_mrg_ver").alias(valid_from),
        F.lit(None).cast("long").alias(valid_to)))
    rows = (j.select(F.explode(F.array(kept_s, app_s)).alias("_mrg_r"))
            .filter(F.col("_mrg_r").isNotNull())
            .select("_mrg_r.*"))
    # output validity columns are BIGINT regardless of the (integer)
    # input width — the pass-through branch normalizes to match
    closed_n = (closed
                .withColumn(valid_from, F.col(valid_from).cast("long"))
                .withColumn(valid_to, F.col(valid_to).cast("long")))
    return (closed_n.select(*history.columns)
            .unionByName(rows.select(*history.columns)))


def scd2_lookup(facts: DataFrame, history: DataFrame,
                keys: "list[str]", at: str,
                valid_from: str = "valid_from",
                valid_to: str = "valid_to",
                prefix: str = "dim_") -> DataFrame:
    """Point-in-time dimension enrichment — the join SCD2 history
    exists FOR: attach to each fact row the history version that was
    valid at the fact's own time, ``valid_from <= at < valid_to``
    (NULL ``valid_to`` = still open). Facts with no valid version at
    their time keep NULL dimension columns (left join — a fact before
    the key first appeared, or inside a tombstone gap, is a real
    analytical outcome, not an error).

    The SCD2 invariant (non-overlapping intervals per key —
    :func:`scd2_apply` maintains it loudly) guarantees AT MOST ONE
    match per fact, so the join cannot fan out — and because
    HAND-BUILT histories do not come with that guarantee, the
    invariant is checked IN-PLAN here too: overlapping intervals (or
    an open row that is not the key's last version) raise instead of
    silently DUPLICATING every fact that hits the overlap and
    double-counting downstream measures. The check is one window over
    the dimensions-sized history. History payload and validity
    columns arrive under ``prefix`` to keep the fact schema
    collision-free.

    ``at`` must be an integer column in the same version units as the
    history clock (the scd2_apply contract). Scale shape: ONE
    null-safe equi-join on the keys with the interval as a residual
    join condition — Catalyst plans a SortMergeJoin keyed on the
    equi part (locked in tests), never an interval cross-product; at
    100 TB the fact side shuffles once on the keys, the
    dimensions-sized history rides the same exchange, and a skewed
    dimension key is the generic salting problem."""
    if not keys:
        raise ValueError("need at least one key column")
    _require_cols(facts, [*keys, at], "scd2_lookup", "facts")
    _require_cols(history, keys, "scd2_lookup", "history")
    _require_int(facts, at, "scd2_lookup")
    for c in (valid_from, valid_to):
        if c not in history.columns:
            raise ValueError(f"history lacks the {c} column")
        # hand-built histories must honor the integer clock too — a
        # non-integer validity column would silently cross-cast and
        # exclude (or NULL-match) every row
        _require_int(history, c, "scd2_lookup")
    _guard_prefix(set(facts.columns) | set(history.columns),
                  "scd2_lookup")
    if prefix.startswith(_PREFIX):
        raise ValueError(
            f"prefix {prefix!r} enters the internal '{_PREFIX}*' "
            "namespace — a prefixed dimension could silently shadow a "
            "join-key alias; pick another prefix")
    dim_cols = [c for c in history.columns if c not in keys]
    out_names = {prefix + c for c in dim_cols}
    bad_out = sorted(out_names & set(facts.columns))
    if bad_out:
        raise ValueError(
            f"prefixed dimension columns {bad_out} collide with fact "
            "columns — pick another prefix")
    # the no-fan-out invariant, enforced on ANY input: within a key
    # (ordered by valid_from) every version's valid_to must reach at
    # most the next version's valid_from, and only the LAST version
    # may be open — an overlap would duplicate matching facts. Rides
    # the emitted valid_from (always selected with the dimensions).
    # valid_to is a deterministic TIEBREAKER: two versions sharing a
    # valid_from are themselves an overlap, and without the tiebreak
    # lead() is nondeterministic about WHICH row raises (the reported
    # interval pair would vary run to run).
    wk = Window.partitionBy(*keys).orderBy(F.col(valid_from),
                                           F.col(valid_to))
    nxt = F.lead(F.col(valid_from)).over(wk)
    overlap = (nxt.isNotNull()
               & (F.col(valid_to).isNull() | (F.col(valid_to) > nxt)))
    ov_bad = F.concat(
        F.lit("scd2_lookup: history intervals OVERLAP for key ("),
        _key_repr(keys),
        F.lit(") — version at "), F.col(valid_from).cast("string"),
        F.lit(" is still valid when the next one opens at "),
        nxt.cast("string"),
        F.lit("; an overlap would silently duplicate every matching "
              "fact — repair the history (scd2_apply maintains the "
              "invariant; hand-built histories must too)"))
    history = history.withColumn(
        valid_from,
        F.when(overlap, F.raise_error(ov_bad)
               .cast(dict(history.dtypes)[valid_from]))
        .otherwise(F.col(valid_from)))
    h = history.select(
        *[F.col(k).alias(f"_mrg_k_{k}") for k in keys],
        *[F.col(c).alias(prefix + c) for c in dim_cols])
    # a NULL fact clock is a data-quality problem, not a "before the
    # key existed" outcome — raise loudly (riding the pass-through at
    # column) instead of silently resolving NULL dimensions
    at_bad = F.concat(
        F.lit(f"scd2_lookup: NULL {at} value — a fact without a clock "
              "cannot be point-in-time joined; repair or filter the "
              "facts first"))
    facts = facts.withColumn(
        at, F.when(F.col(at).isNotNull(), F.col(at))
        .otherwise(F.raise_error(at_bad).cast(dict(facts.dtypes)[at])))
    vf, vt = F.col(prefix + valid_from), F.col(prefix + valid_to)
    cond = (_key_eq(keys) & (vf <= F.col(at))
            & (vt.isNull() | (F.col(at) < vt)))
    return (facts.join(h, cond, "left")
            .drop(*[f"_mrg_k_{k}" for k in keys]))


def change_feed(old: DataFrame, new: DataFrame,
                keys: "list[str]") -> DataFrame:
    """Row-level change feed between two snapshots of a key-addressed
    table — the Delta Change-Data-Feed READ, computed by diff instead
    of a transaction log: ``(*columns, _change_type)`` with one
    ``insert`` row (post image) per key only in ``new``, one
    ``delete`` row (pre image) per key only in ``old``, and an
    ``update_preimage``/``update_postimage`` PAIR per key whose
    payload differs null-safely (the Delta CDF row contract);
    unchanged keys emit nothing. Downstream consumers replay the feed
    idempotently through :func:`merge_upsert`.

    Schemas may differ by ADDED columns in ``new`` (the
    ``new_columns='add'`` evolution path): ``old`` is widened with
    the additions as NULL before comparing, so a pre-evolution row
    whose only difference is NULL-vs-NULL in a new column is
    correctly unchanged. Columns PRESENT in ``old`` but missing from
    ``new`` raise — a dropped column would fabricate a phantom
    set-NULL update pair for every row, and the sibling operators'
    contract is that dropping is never evolution (it also catches
    swapped old/new arguments across an evolution boundary).

    Both snapshots must be key-unique — the merge_upsert/scd2 output
    contract. A duplicate key would fan out through the join into a
    silently wrong feed, so it raises IN-PLAN (riding the presence
    flags every classification branch reads).

    Scale shape: one null-safe full-outer key join between the two
    snapshots, plus one key window per side for the uniqueness guard
    — for the CDC serving tables this feeds on, both sides are
    keys-sized; for fact-scale tables, co-partition or bucket both
    snapshots on the keys first (the merge_upsert sizing rule). Both
    key NULL-safety and the struct payload compare are engine-native
    (no Python eval)."""
    if not keys:
        raise ValueError("need at least one key column")
    _guard_prefix(set(old.columns) | set(new.columns), "change_feed")
    if "_change_type" in set(old.columns) | set(new.columns):
        raise ValueError(
            "_change_type is the feed's own output column — rename it "
            "on the input first")
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"key column {k} missing from a snapshot")
    dropped = sorted(set(old.columns) - set(new.columns))
    if dropped:
        raise ValueError(
            f"columns {dropped} exist in the old snapshot but not the "
            "new one — a dropped column would fabricate a phantom "
            "set-NULL update for every row (dropping is never "
            "evolution; project the old snapshot first, and check the "
            "snapshots are not swapped)")
    # evolution alignment: old gains new's additions as typed NULLs
    old = _widen(old, new)
    payload = [c for c in new.columns if c not in keys]

    def uniq_flag(side: str):
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        bad = F.concat(
            F.lit(f"change_feed: duplicate key in the {side} snapshot "
                  "("),
            _key_repr(keys),
            F.lit(") — snapshots must be key-unique (the merge_upsert/"
                  "scd2 output contract); a duplicate would fan out "
                  "through the diff join into a wrong feed"))
        return (F.when(cnt > 1, F.raise_error(bad).cast("boolean"))
                .otherwise(F.lit(True)))

    o = old.select(
        *[F.col(k).alias(f"_mrg_k_{k}") for k in keys],
        *[F.col(c).alias(f"_mrg_v_{c}") for c in payload],
        uniq_flag("old").alias("_mrg_op"))
    n = new.withColumn("_mrg_np", uniq_flag("new"))
    j = n.join(o, _key_eq(keys), "full_outer")

    def row(tag: str, key_side: str, val_side: str):
        return F.struct(
            F.lit(tag).alias("_change_type"),
            *[(F.col(k) if key_side == "new"
               else F.col(f"_mrg_k_{k}")).alias(k) for k in keys],
            *[(F.col(c) if val_side == "new"
               else F.col(f"_mrg_v_{c}")).alias(c) for c in payload])

    has_old = F.col("_mrg_op").isNotNull()
    has_new = F.col("_mrg_np").isNotNull()
    if payload:
        differs = ~F.struct(*[F.col(f"_mrg_v_{c}") for c in payload]) \
            .eqNullSafe(F.struct(*[F.col(c) for c in payload]))
    else:
        differs = F.lit(False)  # keys-only table: presence is identity
    # the unchanged-key branch is an EMPTY array of the real element
    # type (slice of a never-kept row — explode then emits nothing);
    # a bare F.array() would type-conflict with the struct branches
    arr = (F.when(~has_old, F.array(row("insert", "new", "new")))
           .when(~has_new, F.array(row("delete", "old", "old")))
           .when(differs, F.array(row("update_preimage", "new", "old"),
                                  row("update_postimage", "new", "new")))
           .otherwise(F.slice(F.array(row("insert", "new", "new")), 1, 0)))
    return (j.select(F.explode(arr).alias("_mrg_row"))
            .select("_mrg_row.*")
            .select(*keys, *payload, "_change_type"))
