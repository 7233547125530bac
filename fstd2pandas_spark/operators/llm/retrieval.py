"""BM25 keyword retrieval over the document corpus (Robertson &
Spärck Jones probabilistic relevance framework; the Okapi BM25 formula
is public — Robertson et al., TREC-3 1994).

The classic full-text relevance surface an analytics engine needs next
to embedding ANN: given a (small) set of keyword queries, rank the
corpus by

    score(q, d) = sum over terms t in q of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t) = log10((N - df_t + 0.5) / (df_t + 0.5) + 1)

Determinism contract: per-term scores are quantized to integer
micro-units (``round(score * 1e6)`` as BIGINT — the ``lm.py`` idiom) so
per-document sums are order-free and hash-identical in ANSI SQL; ties
rank by ``doc_id`` ascending.

Scale design (the 100 TB question, answered per stage):

- per-document term frequencies are a shuffle-free in-row fold
  (``transform(array_distinct(toks), ...)`` — O(distinct * n) per
  document, bounded by document size like ``repetition_metrics``);
- the query-term set is genuinely small (queries * terms) and is
  BROADCAST onto the postings before any shuffle, so only matching
  (doc, term) rows ever move;
- document frequencies aggregate the restricted postings (one shuffle
  over matched rows; the df table is <= |query terms| rows and
  broadcasts back);
- corpus stats (N, total tokens) are one 1-row aggregate broadcast via
  crossJoin — exact integers, so avgdl = total/N is the same double in
  both engines;
- top-k is TWO-PHASE: a salted partial top-k per (query, doc_id mod
  n_salts) slice bounds any single reducer at its slice, then the
  final rank runs over <= k * n_salts survivors per query — a query
  containing 'the' cannot pin the whole corpus on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.llm.text import size_col, tokens_col
from fstd2pandas_spark.plans.partitioning import ensure_min_partitions

#: Okapi defaults
BM25_K1 = 1.2
BM25_B = 0.75


def doc_postings(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf, dl) — one row per distinct term per document.

    tf is computed inside the row (distinct-term fold), so the only
    Generate is the explode of the per-document distinct-term structs;
    no shuffle at all.
    """
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    entries = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("term"),
            size_col(F.filter(toks, lambda x: x == t)).alias("tf")),
    )
    return (
        ensure_min_partitions(df)
        .select(id_col, size_col(toks).alias("dl"),
                F.explode(entries).alias("e"))
        .select(id_col, F.col("e.term").alias("term"),
                F.col("e.tf").alias("tf"), "dl")
    )


def _query_terms(spark, queries: "dict[int, str]") -> DataFrame:
    """Distinct (query_id, term) rows from a {qid: text} dict."""
    rows = []
    for qid, text in sorted(queries.items()):
        seen = set()
        for t in text.lower().split(" "):
            if t and t not in seen:
                seen.add(t)
                rows.append((int(qid), t))
    return spark.createDataFrame(rows, "query_id int, term string")


def bm25_scores(df: DataFrame, queries: "dict[int, str]",
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Score every document that matches >= 1 term of each query:
    (query_id, doc_id, bm25_q6, n_matched). ``bm25_q6`` is the integer
    micro-unit score sum — order-free across engines.
    """
    post = doc_postings(df, text_col, id_col)
    # corpus stats over SEARCHABLE documents only: count(text_col)
    # skips NULLs exactly like the total_dl sum does — count(*) would
    # count NULL-text rows into N while their (NULL) lengths drop out
    # of total_dl, silently shrinking avgdl and inflating idf for
    # every real document (the lloyd_refine dilution class)
    stats = df.select(
        F.count(text_col).alias("n_docs"),
        F.sum(size_col(F.filter(tokens_col(F.col(text_col)),
                              lambda t: t != ""))).alias("total_dl"),
    )
    qt = _query_terms(df.sparkSession, queries)
    matched = post.join(F.broadcast(qt), "term")
    dfreq = matched.groupBy("term").agg(
        F.count_distinct(id_col).alias("df_t"))
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_avgdl", F.col("total_dl").cast("double")
                    / F.col("n_docs"))
        .withColumn(
            "_idf",
            F.log10((F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                    / (F.col("df_t") + F.lit(0.5)) + F.lit(1.0)))
        .withColumn(
            "_tfn",
            (F.col("tf") * F.lit(k1 + 1.0))
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("_avgdl"))))
        .withColumn("_q6", F.round(F.col("_idf") * F.col("_tfn")
                                   * F.lit(1_000_000), 0).cast("long"))
    )
    return (
        scored.groupBy("query_id", id_col)
        .agg(F.sum("_q6").alias("bm25_q6"),
             F.count("*").alias("n_matched"))
    )


def bm25_topk(df: DataFrame, queries: "dict[int, str]", k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = BM25_K1, b: float = BM25_B,
              n_salts: int = 16) -> DataFrame:
    """Top-k documents per query by BM25, rank 1..k (ties -> lower
    ``doc_id`` first): (query_id, doc_id, bm25_q6, n_matched, rank).

    Two-phase: rank within (query_id, doc_id % n_salts) first — each
    partial window sees ~1/n_salts of the matches — then the final
    window ranks <= k * n_salts survivors per query.
    """
    scores = bm25_scores(df, queries, text_col, id_col, k1, b)
    order = [F.col("bm25_q6").desc(), F.col(id_col).asc()]
    partial = Window.partitionBy(
        "query_id", F.col(id_col) % n_salts).orderBy(*order)
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        scores.withColumn("_pr", F.row_number().over(partial))
        .filter(F.col("_pr") <= k).drop("_pr")
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
    )
