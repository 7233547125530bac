"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding
— the tokenizer-fitting step of a training-data pipeline (Sennrich et
al. 2016, public), shaped for a 100 TB corpus.

Representation trick that keeps EVERYTHING engine-native and
oracle-mirrorable: a word's symbol sequence is a space-joined string
(``hello`` -> ``h e l l o``), and applying a merge (a, b) -> ab is a
LEFT-TO-RIGHT FOLD over the symbols — if the accumulator's last token
is ``a`` and the next symbol is ``b``, fuse them; else append — which
is exactly canonical BPE's single-pass merge (Sennrich et al. 2016),
identical in Spark (``aggregate``) and the oracle (``list_reduce``),
no per-row Python. A plain ``replace(' a b ' -> ' ab ')`` is NOT
canonical here: consecutive pair occurrences share their delimiter
space, so ``a b a b`` replaced to ``ab a b`` (the second occurrence
lost its leading space to the first match) where true BPE yields
``ab ab`` — repeated-pair words tokenized measurably worse.

Scale design: training operates on the DISTINCT-word table (one
groupBy of the corpus — the working set is vocabulary-sized, not
corpus-sized, the standard BPE-at-scale layout). Each merge round is
one pair-count shuffle over that table plus a narrow replace map; the
only collect is the single argmax pair per round. Encoding joins each
document's tokens against the trained word table (merge-hinted — the
vocabulary can be tens of millions of rows) and sums symbol counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.llm.text import tokens_col


def _merge_once_col(col, a: str, b: str):
    """Apply ONE merge (a, b) -> ab to a space-joined symbol string,
    with canonical BPE single-pass semantics: fold the symbols left to
    right, fusing when the accumulator's LAST token is ``a`` and the
    incoming symbol is ``b``. The freshly fused token ``ab`` differs
    from ``a`` (symbols are never empty), so a fused position cannot
    fuse again within the pass — exactly the rescan rule. Symbols
    contain no spaces by construction, so the ``' ' + a`` suffix test
    is an exact token-boundary check (no LIKE/regex, so metacharacter
    symbols are safe)."""
    syms = F.split(col, " ")
    rest = F.slice(syms, F.lit(2), F.size(syms) - F.lit(1))
    return F.aggregate(
        rest, F.element_at(syms, 1),
        lambda acc, x: F.when(
            (x == F.lit(b))
            & F.endswith(F.concat(F.lit(" "), acc), F.lit(" " + a)),
            F.concat(F.left(acc, F.length(acc) - F.lit(len(a))),
                     F.lit(a + b)))
        .otherwise(F.concat(acc, F.lit(" "), x)))


def _char_spaced(col):
    """'hello' -> 'h e l l o' (one space between code points)."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def bpe_word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercased whitespace words with corpus counts, as
    space-joined character-symbol strings: (s, cnt)."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count("*").alias("cnt"))
        .select(_char_spaced(F.col("w")).alias("s"), "cnt")
    )


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 8, checkpoint_every: int = 4
              ) -> "tuple[list[tuple[str, str]], DataFrame]":
    """Learn `n_merges` merges: each round counts adjacent symbol pairs
    (weighted by word count), picks the most frequent (ties ->
    lexicographically smallest pair, so any engine agrees), and merges
    it everywhere. Returns (merges, final word table (s, cnt)).

    Plan depth grows one merge fold per round; ``checkpoint_every``
    truncates lineage with localCheckpoint (the neardup_components
    idiom) so n_merges can be large without planner blowup."""
    words = bpe_word_table(df, text_col)
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        pairs = words.select(
            F.explode(F.expr(
                "CASE WHEN size(split(s, ' ')) < 2 THEN array() "
                "ELSE transform(sequence(1, size(split(s, ' ')) - 1), "
                "i -> concat(split(s, ' ')[i - 1], ' ', "
                "split(s, ' ')[i])) END")).alias("p"),
            "cnt")
        top = (pairs.groupBy("p").agg(F.sum("cnt").alias("c"))
               .orderBy(F.col("c").desc(), F.col("p").asc())
               .limit(1).collect())
        if not top:
            break
        a, b = top[0]["p"].split(" ", 1)
        merges.append((a, b))
        words = words.select(
            _merge_once_col(F.col("s"), a, b).alias("s"), "cnt")
        if checkpoint_every and (r + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    return merges, words


def apply_merges_col(col, merges: "list[tuple[str, str]]"):
    """Apply a learned merge list, in order, to a space-joined symbol
    string Column — a pure narrow map (one canonical single-pass fold
    per merge; see :func:`_merge_once_col`)."""
    x = col
    for a, b in merges:
        x = _merge_once_col(x, a, b)
    return x


def bpe_token_counts(df: DataFrame, merges: "list[tuple[str, str]]",
                     words: "DataFrame | None" = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document token count under the trained BPE: explode the
    document's words, join the (already-merged) word table for each
    word's symbol count, sum per document. The join is merge-hinted —
    the vocabulary side grows with the corpus and must never broadcast.
    Words outside the training vocabulary fall back to their character
    count (the no-merges-apply upper bound)."""
    if words is None:
        wt = bpe_word_table(df, text_col).select("s")
        words = wt.select(apply_merges_col(F.col("s"), merges).alias("s"))
    vocab = words.select(
        F.replace(F.col("s"), F.lit(" "), F.lit("")).alias("w"),
        F.size(F.split(F.col("s"), " ")).alias("n_sym"),
    ).dropDuplicates(["w"])
    toks = (df.select(F.col(id_col),
                      F.explode(tokens_col(F.col(text_col))).alias("w"))
            .filter(F.col("w") != ""))
    joined = toks.hint("merge").join(vocab, "w", "left")
    per_tok = F.coalesce(F.col("n_sym"), F.length("w"))
    return (joined.groupBy(id_col)
            .agg(F.sum(per_tok).cast("long").alias("bpe_real_tokens")))
