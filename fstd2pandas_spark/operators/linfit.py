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
DuckDB's HUGEINT sums), and the only float steps are the final two
correctly-rounded integer→double casts and one IEEE division — the
same value on every engine, partitioning and summation order. A
constant-x group (denominator 0) yields NULL, never a fake slope.

DECIMAL(38,0) is exact only WITHIN 38 digits. Under ANSI mode (the
Spark 4 default, and this engine's sessions) an overflowing sum or
product raises natively — but under ``spark.sql.ansi.enabled=false``
it becomes NULL (where DuckDB's HUGEINT raises) and ``F.sum`` SKIPS
NULLs, silently dropping the point. Loudness must not depend on a
config flag, so both silent paths are closed in-plan: a per-row
|x|,|y| < 1e18 bound (``MAX_ABS_INPUT``, keeps every product under
1e36 so a per-row NULL is impossible) and a post-aggregation NULL
check on every sum and both polynomials (with bounded non-NULL
inputs, a NULL there can ONLY be overflow → raise). An overflowed
group can therefore never be confused with the constant-x NULL
contract, on any engine configuration.

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

#: per-row input-magnitude ceiling. Under non-ANSI Spark a
#: DECIMAL(38,0) product that exceeds 38 digits becomes NULL and
#: ``F.sum`` silently SKIPS it — a point would quietly drop out of the
#: fit. Bounding |x|,|y| below 1e18 keeps every per-row product x*y /
#: x*x under 1e36 (2 digits of slack inside 38), so a per-row NULL is
#: impossible by construction; sum- and polynomial-level overflow is
#: then caught LOUDLY by the post-aggregation guard (NULL sum with
#: n > 0 can only mean decimal overflow). The MAX_GROUP_MEMBERS
#: precedent: refuse, never silently degrade.
MAX_ABS_INPUT = 10 ** 18


def _guarded_dec(col: str) -> F.Column:
    """Integer column → DECIMAL(38,0), raising in-plan above the
    magnitude contract instead of letting products silently NULL."""
    c = F.col(col).cast(_DEC)
    msg = F.concat(
        F.lit(f"group_linfit: |{col}| = "), F.abs(c).cast("string"),
        F.lit(f" >= MAX_ABS_INPUT={MAX_ABS_INPUT} — products this "
              "size can overflow DECIMAL(38,0) to NULL and silently "
              "drop the point from the fit; rescale the quantization "
              "(the units of the fit are the caller's contract)"))
    return F.when(F.abs(c) < F.lit(MAX_ABS_INPUT).cast(_DEC), c) \
            .otherwise(F.raise_error(msg).cast(_DEC))


def _no_overflow(val: F.Column, what: str) -> F.Column:
    """Post-aggregation guard: with non-NULL bounded inputs, a NULL
    decimal sum/polynomial can ONLY mean 38-digit overflow — raise
    loudly so an overflowed group is never confusable with the
    documented constant-x NULL-slope contract (den == 0 is a real
    zero there, not a NULL)."""
    return F.when(val.isNotNull(), val).otherwise(
        F.raise_error(F.lit(
            f"group_linfit: {what} overflowed DECIMAL(38,0) for a "
            "group (exact integer state exceeded 38 digits) — "
            "rescale the input quantization or center x per group"
        )).cast(_DEC))


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
    x = _guarded_dec(x_col)
    y = _guarded_dec(y_col)
    pts = df.filter(F.col(x_col).isNotNull()
                    & F.col(y_col).isNotNull())
    agg = (pts.groupBy(*gcols)
           .agg(F.count("*").cast(_DEC).alias("_n"),
                F.sum(x).cast(_DEC).alias("_sx"),
                F.sum(y).cast(_DEC).alias("_sy"),
                F.sum((x * y).cast(_DEC)).cast(_DEC).alias("_sxy"),
                F.sum((x * x).cast(_DEC)).cast(_DEC).alias("_sxx")))
    agg = agg.select(
        *gcols, "_n",
        _no_overflow(F.col("_sx"), "sum(x)").alias("_sx"),
        _no_overflow(F.col("_sy"), "sum(y)").alias("_sy"),
        _no_overflow(F.col("_sxy"), "sum(x*y)").alias("_sxy"),
        _no_overflow(F.col("_sxx"), "sum(x*x)").alias("_sxx"))
    num = _no_overflow(
        (F.col("_n") * F.col("_sxy")
         - F.col("_sx") * F.col("_sy")).cast(_DEC), "n*Sxy - Sx*Sy")
    den = _no_overflow(
        (F.col("_n") * F.col("_sxx")
         - F.col("_sx") * F.col("_sx")).cast(_DEC), "n*Sxx - Sx^2")
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
