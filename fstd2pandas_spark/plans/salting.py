"""Key-salting for skewed joins (SURVEY §4 / the 100 TB design).

AQE's skew-join split (enabled in the session defaults) handles most
skew at runtime by splitting oversized partitions, but it cannot split a
SINGLE key's rows across reducers for a sort-merge join build — a
hot key (one grid holding half the records, one stopword shingle) still
lands on one task. Salting fixes that shape: widen the hot side's key
with a salt in [0, n), replicate the other side once per salt, and the
hot key's rows spread over n tasks. Correctness is unaffected — every
original pair still meets on exactly one salt value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Attach a uniform salt in [0, n_salts) to every row (the BIG /
    skewed side). Which salt a row gets is irrelevant to join results,
    so a cheap per-row rand is fine."""
    return df.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salts).cast("int"))


def replicated(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value (the SMALL-per-key side —
    its size multiplies by n_salts, so keep n_salts modest)."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )


def salted_join(big: DataFrame, other: DataFrame, on: "list[str]",
                n_salts: int = 16, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join where ``big``'s hottest keys would otherwise serialize
    on one reducer: salt ``big``, replicate ``other``, join on
    keys + salt, drop the salt."""
    return (
        with_salt(big, n_salts, seed)
        .join(replicated(other, n_salts), [*on, SALT_COL], how)
        .drop(SALT_COL)
    )
