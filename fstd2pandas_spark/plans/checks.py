"""Physical-plan assertions — the scale feedback loop as code.

SURVEY §4: the reference's hand-built optimizations (predicate pushdown
O1, column pruning O2, broadcast lookups O10) are Catalyst built-ins
here, but only if the plan actually shows them. These helpers turn
``.explain()`` eyeballing into test assertions so regressions that
would only hurt at 100 TB (a lost pushdown, a broadcast that became a
shuffle join, a surprise cartesian) fail CI at sf0.001.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan shows PushedFilters containing every fragment."""
    plan = plan_string(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = "; ".join(m)
    for frag in fragments:
        if frag not in pushed:
            raise AssertionError(
                f"filter {frag!r} not pushed to scan; PushedFilters=[{pushed}]")


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (column pruning check)."""
    plan = plan_string(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols += [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
    return sorted(set(cols))


def assert_broadcast_join(df: DataFrame, n_at_least: int = 1) -> None:
    """Assert at least n BroadcastHashJoin/BroadcastNestedLoopJoin nodes."""
    plan = plan_string(df)
    n = len(re.findall(r"Broadcast(Hash|NestedLoop)Join", plan))
    if n < n_at_least:
        raise AssertionError(
            f"expected >= {n_at_least} broadcast joins, plan has {n}")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (each is a full shuffle at scale;
    broadcast exchanges excluded)."""
    plan = plan_string(df, mode="simple")
    return len(re.findall(r"Exchange (hash|range)partitioning", plan))


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert the plan has no CartesianProduct (all-pairs joins must be
    explicit crossJoin choices, never accidents)."""
    plan = plan_string(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains CartesianProduct")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more of the plan stays
    in generated JVM code)."""
    plan = plan_string(df)
    ids = re.findall(r"WholeStageCodegen \((\d+)\)", plan) \
        + re.findall(r"codegen id : (\d+)", plan)
    return len(set(ids))
