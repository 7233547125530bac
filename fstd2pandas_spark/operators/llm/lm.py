"""CCNet-style n-gram language-model quality scoring (Wenzek et al.
2019, public; stupid backoff per Brants et al. 2007, public).

The CCNet pipeline scores every crawled document with a language model
trained on a trusted slice and buckets the corpus into head/middle/tail
by perplexity — the third canonical LLM quality filter next to the
Gopher rules and C4 heuristics (both already in ``text.py``). Here the
LM is a word-bigram model with stupid backoff, trained distributively:

- ``lm_train`` builds the model from the corpus (or a trusted split):
  one explode + groupBy for unigram counts, one for bigram counts, and
  one vocabulary-scale join enriching each bigram with its context
  count — the working set is vocabulary-sized, never corpus-sized.
- ``lm_perplexity`` scores documents: per-occurrence bigrams join the
  model (merge-hinted — the model table grows with the vocabulary) and
  the backoff path joins unigrams on the continuation word. Per-bigram
  log10 probabilities are quantized to integer micro-units
  (``round(log10(p) * 1e6)`` as BIGINT) so the per-document sum is
  order-free and hash-identical across engines — the Lloyd-refinement
  idiom from ``similarity.py``. Bucketing compares the integer sum
  against ``threshold * n_bigrams`` (integer cross-multiplication, no
  division), so head/middle/tail is exact.

Scoring semantics (deliberately simple and engine-mirrorable):

- tokens are lowercased whitespace words (``text.tokens_col``), empty
  strings dropped; a document's bigrams are adjacent token pairs.
- seen bigram:    p = c(w1, w2) / c(w1)
- unseen bigram:  p = alpha * c(w2) / N      (stupid backoff)
- unseen w2:      p = alpha * 1 / N          (Laplace floor — keeps
  log10 finite for genuinely out-of-vocabulary continuations)

Scale design: scoring is one corpus-scale explode plus two merge-hinted
sort-merge joins and one groupBy — the honest cost of LM scoring every
token. Nothing is broadcast (vocabulary grows with the corpus) and no
driver-side state beyond the single total-token count N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.llm.text import size_col, tokens_col
from fstd2pandas_spark.plans.partitioning import ensure_min_partitions

#: stupid-backoff discount (Brants et al. 2007 use 0.4)
BACKOFF_ALPHA = 0.4

#: default head/middle bucket thresholds, in integer micro-log10-prob
#: per bigram (avg log10 p >= -1.2 -> head, >= -2.0 -> middle). Like
#: CCNet's percentile cutoffs these come from a held sample offline —
#: fixed constants keep bucketing a narrow map instead of a global sort.
DEFAULT_HEAD_Q6 = -1_200_000
DEFAULT_MIDDLE_Q6 = -2_000_000


def _word_rows(df: DataFrame, text_col: str, *extra: str) -> DataFrame:
    """One row per token occurrence: (*extra, w)."""
    return (
        df.select(*extra, F.explode(tokens_col(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
    )


def _bigram_rows(df: DataFrame, text_col: str, *extra: str) -> DataFrame:
    """One row per adjacent-token pair occurrence: (*extra, w1, w2).

    Empty tokens are filtered BEFORE pairing (mirrors ``_word_rows`` so
    unigram and bigram counts describe the same token stream — a text
    with doubled spaces yields no phantom '' context).
    """
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    pairs = F.when(size_col(toks) < 2, F.array().cast(
        "array<struct<w1:string,w2:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), size_col(toks) - 1),
            lambda i: F.struct(F.element_at(toks, i).alias("w1"),
                               F.element_at(toks, i + 1).alias("w2")),
        ))
    return (
        df.select(*extra, F.explode(pairs).alias("p"))
        .select(*extra, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def lm_train(df: DataFrame, text_col: str = "text",
             ) -> "tuple[DataFrame, DataFrame, int]":
    """Fit the bigram model on ``df`` (typically the trusted/train
    split). Returns ``(model, unigrams, total_tokens)`` where

    - ``model``    = (w1, w2, c_bi, c_w1) — bigram counts enriched with
      the context count via ONE vocabulary-scale join at train time, so
      scoring's hit path needs a single lookup join;
    - ``unigrams`` = (w, c_uni) for the backoff path;
    - ``total_tokens`` = N (one scalar collect — bounded).
    """
    uni = (_word_rows(df, text_col).groupBy("w")
           .agg(F.count("*").alias("c_uni")))
    bi = (_bigram_rows(df, text_col).groupBy("w1", "w2")
          .agg(F.count("*").alias("c_bi")))
    model = bi.join(uni.hint("merge").select(F.col("w").alias("w1"),
                                             F.col("c_uni").alias("c_w1")),
                    "w1")
    # N as a plain count of word rows (r19): sum(c_uni) over the
    # unigram aggregation is the same number by construction, but the
    # count's partial aggregation skips the vocabulary shuffle in this
    # eager job (uni itself stays lazy for the scoring plan)
    total = _word_rows(df, text_col).count()
    return model, uni, int(total)


def _q6(p: Column) -> Column:
    """log10(p) in integer micro-units — order-free summation across
    engines (both round half away from zero)."""
    return F.round(F.log10(p) * F.lit(1_000_000), 0).cast("long")


def lm_perplexity(df: DataFrame, model: DataFrame, unigrams: DataFrame,
                  total_tokens: int, text_col: str = "text",
                  id_col: str = "doc_id", alpha: float = BACKOFF_ALPHA,
                  head_q6: int = DEFAULT_HEAD_Q6,
                  middle_q6: int = DEFAULT_MIDDLE_Q6) -> DataFrame:
    """Score every document of ``df`` against a trained model; adds

    - ``lm_bigrams`` — scored bigram count (0 for < 2 tokens; NULL
      for NULL text — unknown content is not an empty document, the
      module's NULL-metric contract);
    - ``lm_q6``      — sum of per-bigram quantized log10 probabilities
      (micro-units, BIGINT; 0 when no bigrams, NULL for NULL text);
    - ``lm_bucket``  — 'head' / 'middle' / 'tail' by the integer
      cross-multiplication ``lm_q6 >= threshold * lm_bigrams``,
      'empty' when there is genuinely nothing to score, NULL for NULL
      text (unguarded, the when-chain's otherwise-arm would have
      labeled unknown content 'tail').

    Lower (more negative) ``lm_q6 / lm_bigrams`` = higher perplexity =
    further into the tail, exactly CCNet's ordering.
    """
    if total_tokens <= 0:
        raise ValueError("lm_perplexity: model trained on an empty corpus")
    doc_bi = _bigram_rows(ensure_min_partitions(df), text_col, id_col)
    scored = (
        doc_bi
        .join(model.hint("merge"), ["w1", "w2"], "left")
        .join(unigrams.hint("merge")
              .select(F.col("w").alias("w2"), F.col("c_uni").alias("c_w2")),
              "w2", "left")
        .select(
            id_col,
            F.when(F.col("c_bi").isNotNull(),
                   _q6(F.col("c_bi") / F.col("c_w1")))
            .otherwise(_q6(F.lit(alpha) * F.coalesce(F.col("c_w2"), F.lit(1))
                           / F.lit(total_tokens)))
            .alias("q6"),
        )
        .groupBy(id_col)
        .agg(F.sum("q6").alias("lm_q6"), F.count("*").alias("lm_bigrams"))
    )
    has_text = F.col(text_col).isNotNull()
    out = (
        df.join(scored.hint("merge"), id_col, "left")
        .withColumn("lm_bigrams",
                    F.when(has_text,
                           F.coalesce(F.col("lm_bigrams"), F.lit(0)))
                    .cast("long"))
        .withColumn("lm_q6",
                    F.when(has_text,
                           F.coalesce(F.col("lm_q6"), F.lit(0)))
                    .cast("long"))
    )
    return out.withColumn(
        "lm_bucket",
        # NULL text FIRST: with lm_bigrams NULL every comparison arm
        # below is NULL and the otherwise-arm would label unknown
        # content 'tail'
        F.when(F.col("lm_bigrams").isNull(), F.lit(None).cast("string"))
        .when(F.col("lm_bigrams") == 0, F.lit("empty"))
        .when(F.col("lm_q6") >= F.lit(head_q6) * F.col("lm_bigrams"),
              F.lit("head"))
        .when(F.col("lm_q6") >= F.lit(middle_q6) * F.col("lm_bigrams"),
              F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
