"""Per-group least-squares trend fitting with an engine-deterministic
contract — drift detection as an aggregate.

"Is this stream's value trending up?" per user / per source / per
sensor is a classic monitoring question; at 100 TB it must be ONE
aggregation, not a per-group model fit. Ordinary least squares over a
group reduces to five sums (n, Σx, Σy, Σxy, Σx²):

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²),   intercept from means

This module makes that bit-deterministic across engines the same way
the sketch toolkit does: inputs are INTEGER columns (callers quantize
— epoch hours, micro-units), the five sums and both polynomials are
computed in DECIMAL(38,0) (exact 128-bit integer arithmetic, matching
DuckDB's HUGEINT sums; 38 digits of headroom means no silent BIGINT
wraparound), and the only float steps are the final two
correctly-rounded integer→double casts and one IEEE division — the
same value on every engine, partitioning and summation order. A
constant-x group (denominator 0) yields NULL, never a fake slope.

Scale shape: ONE map-side-combinable aggregation, five numbers of
state per group; a billion groups stream through one shuffle on the
group key. Callers wanting x centered per group (the overflow-taming
idiom) compute ``x - min(x) over (partition by group)`` first — a
window over the same key the aggregation shuffles on, so Catalyst
plans one exchange for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def group_linfit(df: DataFrame, x_col: str, y_col: str,
                 group_cols: "list[str] | None" = None) -> DataFrame:
    """``(*group_cols, n, slope, intercept)`` per group from integer
    ``x_col``/``y_col`` (non-integer columns raise — quantization is
    the CALLER's contract, it defines the units of the fit). Rows with
    a NULL x or y are excluded (they have no point). ``slope`` and
    ``intercept`` are doubles from exact decimal polynomials; both are
    NULL when every x in the group is identical (vertical/undefined
    fit) and when n == 0 the group simply has no row."""
    for c in (x_col, y_col):
        t = dict(df.dtypes).get(c)
        if t not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"{c} must be an integer column (got {t}) — quantize "
                "explicitly; implicit float sums would be "
                "summation-order-dependent")
    gcols = list(group_cols or [])
    x = F.col(x_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    pts = df.filter(F.col(x_col).isNotNull()
                    & F.col(y_col).isNotNull())
    agg = (pts.groupBy(*gcols)
           .agg(F.count("*").cast(_DEC).alias("_n"),
                F.sum(x).cast(_DEC).alias("_sx"),
                F.sum(y).cast(_DEC).alias("_sy"),
                F.sum((x * y).cast(_DEC)).cast(_DEC).alias("_sxy"),
                F.sum((x * x).cast(_DEC)).cast(_DEC).alias("_sxx")))
    num = (F.col("_n") * F.col("_sxy")
           - F.col("_sx") * F.col("_sy")).cast(_DEC)
    den = (F.col("_n") * F.col("_sxx")
           - F.col("_sx") * F.col("_sx")).cast(_DEC)
    slope = F.when(
        den != 0, num.cast("double") / den.cast("double"))
    # intercept = (Σy − slope·Σx) / n, with the same exact-integer
    # numerator split so the only float ops are casts and divisions
    intercept = F.when(
        den != 0,
        (F.col("_sy").cast("double")
         - (num.cast("double") / den.cast("double"))
         * F.col("_sx").cast("double"))
        / F.col("_n").cast("double"))
    return agg.select(
        *gcols, F.col("_n").cast("long").alias("n"),
        slope.alias("slope"), intercept.alias("intercept"))
