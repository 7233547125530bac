"""fastText-style hashed linear text classifier — the quality-filter
architecture of real LLM data pipelines (CCNet's fastText language /
Wikipedia-likeness filters, LLaMA's quality classifiers): tokens hash
into a fixed-width bucket space (the "hashing trick"), a linear head
dots the bucket counts with a weight vector, and a threshold keeps or
drops the document.

Scale design: the whole classifier is a shuffle-free narrow map — one
`transform` computes each token's bucket, one `aggregate` fold sums the
bucket weights; no shuffle, no join, no Python, whole-stage codegen.
At 100 TB this scores at scan speed, which is exactly why production
pipelines use linear classifiers for corpus-wide filtering (a
transformer scorer is ~10^4x the FLOPs for the first-pass cut).

Weights: scores are integer micro-units so cross-engine verification is
exact (float dot products are summation-order-sensitive; integers are
order-free).  The default weight function derives a deterministic
pseudo-weight in [-1000, 1000] from the md5 of the bucket index — a
stand-in with the exact plan shape of a trained model.  A REAL trained
model plugs in by passing its quantized weight vector: the bucket
lookup becomes ``element_at(lit(weights), bucket + 1)`` (a broadcast
array literal — fastText quality heads are ~10^5-10^6 weights, a few
MB, well inside literal/broadcast bounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.llm.text import tokens_col


def token_bucket_col(token: Column, dim: int) -> Column:
    """Hashing-trick bucket of a token: first 8 md5 hex digits mod
    ``dim`` (md5: deterministic across engines and partitionings,
    unlike hash())."""
    return (F.conv(F.substring(F.md5(token), 1, 8), 16, 10)
            .cast("long") % dim)


def default_weight_col(bucket: Column) -> Column:
    """Deterministic pseudo-weight in [-1000, 1000] micro-units for a
    bucket index — md5-derived so any engine reproduces it."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit("w"), bucket.cast("string"))), 1, 8),
        16, 10).cast("long") % 2001) - 1000


def linear_text_classifier(df: DataFrame, text_col: str = "text",
                           dim: int = 1024,
                           weights: "list[int] | None" = None,
                           bias: int = 0,
                           threshold: int = 0,
                           out_prefix: str = "clf") -> DataFrame:
    """Score every document with a hashed linear head; adds
    ``{prefix}_score`` (integer micro-units: bias + sum of per-token
    bucket weights) and ``{prefix}_keep`` (score > threshold).

    ``weights``: an optional trained weight vector of length ``dim``
    (integer micro-units).  Without it the deterministic md5-derived
    pseudo-weights stand in — same plan, same cost, oracle-exact.
    NULL text scores NULL and gets a NULL verdict — the module's
    NULL-metric contract: a keep/drop decided by bias alone would
    hand every unknown-content document the SAME definite verdict,
    which is precisely what a corpus-wide quality filter must not do
    silently (empty text, by contrast, genuinely scores the bias)."""
    if weights is not None and len(weights) != dim:
        raise ValueError(
            f"weights length {len(weights)} != dim {dim}")
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    buckets = F.transform(toks, lambda t: token_bucket_col(t, dim))
    if weights is None:
        per_tok = F.transform(buckets, default_weight_col)
    else:
        warr = F.array(*[F.lit(int(w)).cast("long") for w in weights])
        per_tok = F.transform(
            buckets, lambda b: F.element_at(warr, (b + 1).cast("int")))
    # per_tok is NULL exactly when the text is NULL (split of a
    # non-null string is never NULL), so the fold's own NULL
    # propagation IS the contract — no second text_col reference
    score = F.aggregate(
        per_tok,
        F.lit(int(bias)).cast("long"), lambda a, x: a + x)
    return (
        df.withColumn(f"{out_prefix}_score", score)
        .withColumn(f"{out_prefix}_keep",
                    F.col(f"{out_prefix}_score") > threshold)
    )
