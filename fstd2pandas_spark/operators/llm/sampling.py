"""Deterministic dataset splitting and sampling for training pipelines.

``rand()``-based splits change membership per run, per retry, and per
partitioning — poison for reproducible training sets. These helpers key
every decision on an md5 of the row's id plus a seed string, so the
split is a pure function of the data: stable across engines (the SQL
oracle reproduces it), re-runs, and cluster layouts, and new rows land
in splits without disturbing old ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(id_col: Column, seed: str, n: int = 100) -> Column:
    """Uniform bucket in [0, n) from md5(seed_id) — deterministic."""
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}_"), id_col.cast("string"))),
            1, 8), 16, 10).cast("long") % n
    ).cast("int")


def hash_split(df: DataFrame, id_col: str = "doc_id", val_pct: int = 5,
               test_pct: int = 0, seed: str = "split1") -> DataFrame:
    """Add a ``split`` column: 'val' for the first ``val_pct`` hash
    buckets, 'test' for the next ``test_pct``, 'train' otherwise."""
    if not 0 <= val_pct + test_pct <= 100:
        raise ValueError("val_pct + test_pct must be within [0, 100]")
    b = _hash_bucket(F.col(id_col), seed)
    return df.withColumn(
        "split",
        F.when(b < val_pct, "val")
        .when(b < val_pct + test_pct, "test")
        .otherwise("train"),
    )


def hash_sample(df: DataFrame, pct: int, id_col: str = "doc_id",
                seed: str = "sample1") -> DataFrame:
    """Keep a deterministic ``pct``-percent sample by id hash (the
    repeatable alternative to ``df.sample``)."""
    if not 0 < pct <= 100:
        raise ValueError("pct must be in (0, 100]")
    return df.filter(_hash_bucket(F.col(id_col), seed) < pct)
