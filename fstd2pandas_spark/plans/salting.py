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

from pyspark.sql import DataFrame
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
    keys + salt, drop the salt.

    ``how`` must preserve the replicated side's multiplicity-invariance:
    inner/left/semi/anti only see ``other`` rows that MATCH (each big
    row meets its one salt's copy — exactly once). A right or full
    OUTER join would also emit ``other``'s UNMATCHED rows — which
    exist once per salt after replication — silently duplicating every
    unmatched right row ``n_salts`` times; refused."""
    h = how.lower().replace("_", "").replace("outer", "")
    if h in ("right", "full"):
        raise ValueError(
            f"salted_join: how={how!r} — an outer side on the "
            "REPLICATED input emits its unmatched rows once per salt "
            f"(x{n_salts} duplication); salt the other side or use an "
            "unsalted join for right/full outer")
    return (
        with_salt(big, n_salts, seed)
        .join(replicated(other, n_salts), [*on, SALT_COL], how)
        .drop(SALT_COL)
    )


#: top-k ceiling for key_skew_report — the final rank window runs on a
#: single partition of k rows by construction, so k is bounded loudly
#: (the MAX_HIST_BINS convention), not by accident of a typo'd argument.
MAX_SKEW_TOPK = 10_000


def key_skew_report(df: DataFrame, key_cols: "list[str]",
                    top_k: int = 20) -> DataFrame:
    """The "which keys need salting" diagnosis: the ``top_k`` heaviest
    key values with exact counts, parts-per-million share and a
    deterministic rank — what a 100 TB operator reads before deciding
    ``n_salts`` (or whether AQE's split already suffices).

    Scale shape: ONE map-side-combinable count aggregation (keys-sized
    output), a 1-row total broadcast (the nmin crossJoin pattern),
    then ``orderBy().limit()`` over the KEYS-sized frame only — the
    facts are never sorted. Catalyst plans that as a distributed
    range sort with the LocalLimit pushed below the single-partition
    merge, so the merge sees at most ``top_k x partitions`` rows
    (verified in the unit test; TakeOrderedAndProject only applies to
    terminal limits). The final rank window runs on the k surviving
    rows only. share_ppm is exact integer division (``n * 1e6 div
    total``) — no float, engine-free; ties rank by the key columns
    ascending, so the report is bit-deterministic."""
    if not key_cols:
        raise ValueError("need at least one key column")
    reserved = {"n_rows", "share_ppm", "rank", "_skw_total"}
    clash = reserved & set(key_cols)
    if clash:
        raise ValueError(
            f"key columns {sorted(clash)} collide with the report's "
            "output names — rename them first (the merge_upsert "
            "reserved-name convention)")
    if not (1 <= top_k <= MAX_SKEW_TOPK):
        raise ValueError(
            f"top_k={top_k} outside [1, MAX_SKEW_TOPK={MAX_SKEW_TOPK}] "
            "— the final rank window is a single partition of top_k "
            "rows; raise the ceiling deliberately if a wider report "
            "is worth it")
    from pyspark.sql import Window

    cnt = (df.groupBy(*key_cols)
           .agg(F.count("*").cast("long").alias("n_rows")))
    tot = cnt.agg(F.sum("n_rows").cast("long").alias("_skw_total"))
    order = [F.col("n_rows").desc()] + [F.col(c).asc_nulls_last()
                                        for c in key_cols]
    top = (cnt.crossJoin(F.broadcast(tot))
           .orderBy(*order).limit(top_k))
    w = Window.orderBy(*order)
    # loud no-wrap bound on the ppm numerator (the MAX_GROUP_ROWS
    # convention): n_rows * 1e6 must stay inside int64
    lim = (2 ** 63 - 1) // 1_000_000
    bad = F.concat(
        F.lit("key_skew_report: a key holds "),
        F.col("n_rows").cast("string"),
        F.lit(f" rows > {lim} — the ppm numerator would wrap int64"))
    n_ok = (F.when(F.col("n_rows") <= F.lit(lim), F.col("n_rows"))
            .otherwise(F.raise_error(bad).cast("long")))
    return (top
            .withColumn("n_rows", n_ok)
            .withColumn("share_ppm",
                        F.expr("(n_rows * 1000000L) div _skw_total")
                        .cast("long"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select(*key_cols, "n_rows", "share_ppm", "rank"))
