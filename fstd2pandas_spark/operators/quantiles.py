"""Exact per-group discrete quantiles — the quality-threshold picker.

A training-data pipeline constantly needs per-stratum score thresholds
("drop the bottom quartile of quality per language", "cap documents
above the p99 length per source"). Approximate sketches
(percentile_approx, t-digest, KLL) are rank-randomized or
merge-order-dependent — useless under this repo's bit-determinism
contract — so this module implements the EXACT discrete
(nearest-rank) quantile: 1-based rank ``max(1, ceil(q * n))`` of the
ascending sort, the definition DuckDB's native ``quantile_disc``
implements (probed: n=4/5/10 across q=0/.25/.5/.75/1), which makes a
natively-derived SQL oracle possible. Discrete = type-preserving: an
integer column yields an actual member value, never an interpolated
float, and the result is independent of tie ordering (the value at a
sorted rank is a property of the multiset).

Scale shape: ONE hash-partition + sort window per group — the exact
cost of exact quantiles; groups are independent so 1000 executors
stream 1000 strata concurrently, and a skewed stratum is a sort-spill,
not a collect. The rank arithmetic is exact across engines when q is
a binary fraction (0.25/0.5/0.75/...): q*n is then an exact IEEE
product and ceil is deterministic; arbitrary q is supported but only
binary fractions are gate-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles_disc(df: DataFrame, value_col: str,
                         group_cols: "list[str] | None" = None,
                         qs: "tuple[float, ...]" = (0.25, 0.5, 0.75),
                         ) -> DataFrame:
    """``(*group_cols, q, value)``: the exact discrete q-quantile of
    ``value_col`` per group for every q in ``qs`` — the member value at
    ascending rank ``max(1, ceil(q * n))``, NULLs excluded (they have
    no rank; DuckDB's quantile_disc skips them identically) and — for
    float/double columns — NaNs excluded too: a NaN score is an
    unknown value with no defined rank, and the engines genuinely
    DISAGREE on where it sorts (probed: Spark orders NaN above every
    double, so it lands at q=1.0; DuckDB's quantile_disc returned it
    as the MEDIAN of (1, NaN, 3)) — including it would make the
    threshold engine-dependent, breaking the module's determinism
    contract. One sort window serves every q: each ranked row checks
    membership against the (tiny, broadcast-literal) q list, so asking
    for 3 quantiles or 30 costs the same single shuffle."""
    if not qs:
        raise ValueError("qs must be non-empty")
    qlist = sorted(set(float(q) for q in qs))
    for q in qlist:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    gcols = list(group_cols or [])
    w = Window.partitionBy(*gcols).orderBy(F.col("value").asc())
    wn = Window.partitionBy(*gcols)
    # row_number() is IntegerType by definition, so a group is hard-
    # bounded at 2^31-1 rows; past that the rank itself would be
    # meaningless. Guard LOUDLY (the sketch parameter-check precedent)
    # instead of letting a non-ANSI int cast wrap the target rank, and
    # compute the target rank in LONG so the comparison never narrows.
    n_raw = F.count("*").over(wn)
    n_guarded = F.when(n_raw <= F.lit(2 ** 31 - 1), n_raw).otherwise(
        F.raise_error(F.concat(
            F.lit("group_quantiles_disc: a group has "),
            n_raw.cast("string"),
            F.lit(" rows, above INT_MAX — row_number() ranks are "
                  "32-bit; split the stratum or pre-aggregate"))
        ).cast("long"))
    keep = F.col(value_col).isNotNull()
    if dict(df.dtypes).get(value_col) in ("float", "double"):
        keep = keep & ~F.isnan(F.col(value_col))
    ranked = (df.filter(keep)
              .select(*gcols, F.col(value_col).alias("value"))
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", n_guarded))
    qarr = F.array(*[F.lit(q) for q in qlist])
    return (ranked
            .select(*gcols, "value", "_rn", "_n",
                    F.explode(qarr).alias("q"))
            .filter(F.col("_rn").cast("long")
                    == F.greatest(F.lit(1).cast("long"),
                                  F.ceil(F.col("q") * F.col("_n"))
                                  .cast("long")))
            .select(*gcols, "q", "value"))


def quantile_flags(df: DataFrame, value_col: str, group_col: str,
                   qs: "tuple[float, ...]" = (0.25, 0.5, 0.75),
                   ) -> DataFrame:
    """Join each group's quantile thresholds back onto the rows and
    flag the below-median stratum — the "drop the bottom of each
    language" decision as data. Adds one pivoted column per q
    (``q25``/``q50``/``q75`` for the defaults, label = round(q*100))
    plus ``below_med`` (value < the 0.5 threshold; requires 0.5 in
    ``qs``). The thresholds table is G·|qs|-bounded, so the join back
    onto a corpus of any size broadcasts.

    CARDINALITY CONTRACT: the forced ``F.broadcast`` assumes the
    number of distinct groups G is broadcast-small (strata like
    language/source — tens to thousands). A group column with
    unbounded cardinality (e.g. doc_id) makes the pivoted table
    corpus-sized and the forced broadcast would exhaust the driver
    rather than degrade to a shuffle join — pick a real stratum
    column, or call ``group_quantiles_disc`` and join without the
    broadcast hint so AQE chooses."""
    if 0.5 not in [float(q) for q in qs]:
        raise ValueError("quantile_flags needs 0.5 in qs for below_med")
    th = group_quantiles_disc(df, value_col, [group_col], qs)
    wide = (th.groupBy(group_col)
            .pivot("q", [float(q) for q in sorted(set(qs))])
            .agg(F.first("value")))
    renames = {str(float(q)): f"q{round(float(q) * 100)}"
               for q in sorted(set(qs))}
    if len(set(renames.values())) != len(renames):
        raise ValueError(
            f"quantile_flags: qs {sorted(set(float(q) for q in qs))} "
            "collide after the q{round(q*100)} labeling — two "
            "thresholds would silently share one output column; "
            "use group_quantiles_disc directly for sub-percent qs")
    for old, new in renames.items():
        wide = wide.withColumnRenamed(old, new)
    # eqNullSafe, NOT the name-equality join: group_quantiles_disc
    # treats NULL as its own stratum (the module rule sampling.py's
    # temperature_mix_sample settled), so its threshold row EXISTS —
    # a plain equi-join would compute it and then hand every NULL-group
    # row NULL thresholds back (below_med NULL despite a known median).
    jc = df[group_col].eqNullSafe(wide[group_col])
    qcols = [c for c in wide.columns if c != group_col]
    return (df.join(F.broadcast(wide), jc, "left")
            .drop(wide[group_col])
            # restore the name-equality join's key-first column order
            # (the expression join keeps df's natural order instead)
            .select(group_col,
                    *[c for c in df.columns if c != group_col],
                    *qcols)
            .withColumn("below_med", F.col(value_col) < F.col("q50")))
