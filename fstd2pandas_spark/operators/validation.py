"""Declarative table-quality constraint checks — the Deequ /
Great-Expectations primitive a 100 TB ingest runs before promoting a
batch: every rule (null-rate, range, set membership, pattern,
uniqueness, custom predicate) is evaluated in ONE pass over the facts
and the report is a rules-sized frame.

Scale shape: all violation counters compile into a SINGLE global
aggregation — map-side combinable integer sums, so the fact table is
read once regardless of how many rules ride along; ``unique`` rules
add exact ``count(DISTINCT col)`` terms (Catalyst's Expand handles
several in one aggregate — exact by contract here: an approximate
uniqueness check cannot certify a key). The report explodes from the
one aggregated row driver-side-free (a rules-length array on a 1-row
frame).

Determinism contract: counts are integer sums (order/partition/
engine-free). ``matches`` rules use Spark's Java regex dialect —
cross-engine mirrors must stick to the common-subset syntax (char
classes, anchors, quantifiers).

Rules are ``(name, column, kind, *params)`` tuples:

- ``("r1", c, "not_null")`` — violation: NULL
- ``("r2", c, "min", lo)`` / ``("r3", c, "max", hi)`` — violation:
  non-NULL value outside the bound (NULLs are ``not_null``'s job)
- ``("r4", c, "between", lo, hi)``
- ``("r5", c, "in_set", [v, ...])`` — violation: non-NULL value not
  in the set
- ``("r6", c, "matches", pattern)`` — violation: non-NULL value not
  rlike pattern
- ``("r7", c, "unique")`` — violations: non-NULL rows minus distinct
  values (exact)
- ``("r8", c, "custom", Column)`` — violation: the predicate is true

``strict=True`` turns the report into a gate: any violation raises
IN-PLAN (riding the always-selected violation counter — the
loud-guard convention), so a bad batch can never be silently
promoted by a caller that forgets to inspect the report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "min", "max", "between", "in_set", "matches",
          "unique", "custom")


def _violation_agg(rule) -> Column:
    name, col, kind = rule[0], rule[1], rule[2]
    c = F.col(col)
    if kind == "not_null":
        cond = c.isNull()
    elif kind == "min":
        cond = c.isNotNull() & (c < F.lit(rule[3]))
    elif kind == "max":
        cond = c.isNotNull() & (c > F.lit(rule[3]))
    elif kind == "between":
        cond = c.isNotNull() & ((c < F.lit(rule[3])) | (c > F.lit(rule[4])))
    elif kind == "in_set":
        vals = list(rule[3])
        if not vals:
            raise ValueError(
                f"rule {name}: in_set with an EMPTY set — every "
                "non-NULL value would violate; if that is the intent "
                "(column must be all NULL), use not_null's inverse "
                "via a custom rule")
        if any(v is None for v in vals):
            # SQL three-valued logic: x IN (.., NULL) is NULL for
            # every non-member, so ~isin is NULL and the violation
            # arm NEVER fires — the rule silently counted zero
            # violations for all out-of-set values
            raise ValueError(
                f"rule {name}: in_set contains None — NULL is not a "
                "set member in SQL (x IN (.., NULL) is NULL, and the "
                "rule would silently count zero violations); NULLs "
                "are not_null's job")
        cond = c.isNotNull() & ~c.isin(*vals)
    elif kind == "matches":
        cond = c.isNotNull() & ~c.rlike(rule[3])
    elif kind == "unique":
        return (F.count(c) - F.count_distinct(c)).cast("long")
    elif kind == "custom":
        pred = rule[3]
        if not isinstance(pred, Column):
            raise ValueError(
                f"rule {name}: custom predicate must be a Column")
        cond = pred
    else:
        raise ValueError(
            f"rule {name}: unknown kind {kind!r} (one of {_KINDS})")
    # coalesce: SUM over an EMPTY table is NULL — an empty batch is a
    # routine, clean case for a promotion gate, not a violation (and
    # strict mode must not raise on it)
    return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)),
                      F.lit(0)).cast("long")


def table_quality_report(df: DataFrame, rules: "list[tuple]",
                         strict: bool = False) -> DataFrame:
    """One row per rule: ``(name, column, kind, n_rows, n_violations,
    passed)`` — computed in one aggregation pass (see module
    docstring). Duplicate rule names raise (the report would be
    ambiguous)."""
    return _report(df, [], rules, strict, "table_quality_report")


def grouped_quality_report(df: DataFrame, group_cols: "list[str]",
                           rules: "list[tuple]",
                           strict: bool = False) -> DataFrame:
    """Per-GROUP constraint checks — the stratified Deequ pattern a
    corpus pipeline runs per language / domain / source shard ("every
    stratum must satisfy X", not just the table as a whole): one row
    per ``(*group_cols, rule)``, still computed in ONE aggregation
    pass over the facts (groups-x-rules-sized output). ``strict=True``
    raises on the FIRST group violating any rule — a bad stratum must
    not be silently promoted with the good ones."""
    if not group_cols:
        raise ValueError(
            "need at least one group column (table_quality_report is "
            "the ungrouped form)")
    reserved = {"name", "column", "kind", "n_rows", "n_violations",
                "passed"}
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(
            f"group columns {sorted(clash)} collide with the report's "
            "output names — rename them first")
    # the internal aggregation aliases are reserved too — a group
    # column named _qr_n would die with an opaque ambiguous-reference
    # AnalysisException deep in analysis instead of this message (the
    # _mrg_* prefix-guard convention)
    qr_clash = sorted(c for c in group_cols if c.startswith("_qr_"))
    if qr_clash:
        raise ValueError(
            f"group columns {qr_clash} collide with the report's "
            "internal '_qr_*' aggregation names — rename them first")
    return _report(df, group_cols, rules, strict,
                   "grouped_quality_report")


def _report(df: DataFrame, group_cols: "list[str]",
            rules: "list[tuple]", strict: bool, who: str) -> DataFrame:
    if not rules:
        raise ValueError("need at least one rule")
    names = [r[0] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")
    aggs = [F.count("*").cast("long").alias("_qr_n")]
    # the strict raise must NAME the offending stratum — on a
    # 200-language corpus "rule max_ntok has 3 violations" without
    # the group-key values forces a non-strict re-run to find out
    # which; the group columns are in scope at aggregation time
    # (they are the grouping keys), so they ride into the message.
    # Each value coalesces to the literal 'NULL' — concat_ws would
    # silently SKIP a NULL group key and misreport the stratum.
    stratum = ([F.lit(" in stratum ("),
                F.concat_ws(", ", *[
                    F.coalesce(F.col(g).cast("string"), F.lit("NULL"))
                    for g in group_cols]),
                F.lit(")")] if group_cols else [])
    for i, rule in enumerate(rules):
        v = _violation_agg(rule)
        if strict:
            bad = F.concat(
                F.lit(f"{who}: rule {rule[0]} "
                      f"({rule[2]} on {rule[1]}) has "),
                v.cast("string"), F.lit(" violations"), *stratum,
                F.lit(" (strict mode)"))
            v = (F.when(v == 0, v)
                 .otherwise(F.raise_error(bad).cast("long")))
        aggs.append(v.alias(f"_qr_v{i}"))
    one = (df.groupBy(*group_cols) if group_cols else df.groupBy()) \
        .agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(r[0]).alias("name"),
            F.lit(r[1]).alias("column"),
            F.lit(r[2]).alias("kind"),
            F.col("_qr_n").alias("n_rows"),
            F.col(f"_qr_v{i}").alias("n_violations"),
            (F.col(f"_qr_v{i}") == 0).alias("passed"))
        for i, r in enumerate(rules)])
    return (one.select(*group_cols, F.explode(entries).alias("_e"))
            .select(*group_cols, "_e.*"))
