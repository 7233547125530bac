"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation corpus (the standard leakage guard in a
training-data pipeline).

Spark shape: the benchmark's distinct shingle set broadcasts (eval sets
are tiny next to the corpus); per-doc overlap is one broadcast semi-join
plus a count — the corpus is scanned once, never shuffled on text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fstd2pandas_spark.operators.llm.text import shingles_col, tokens_col


def _shingle_set(df: DataFrame, text_col: str, id_col: str,
                 shingle_k: int) -> DataFrame:
    return (
        df.withColumn("_tk", tokens_col(F.col(text_col)))
        .select(F.col(id_col), F.explode(
            F.array_distinct(shingles_col(F.col("_tk"), shingle_k))
        ).alias("shingle"))
    )


def contamination_overlap(docs: DataFrame, bench: DataFrame,
                          shingle_k: int = 3, min_shared: int = 1,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per document: the count of distinct shingles shared with the
    benchmark corpus and a ``contaminated`` flag (count >= min_shared).
    Documents with no overlap report 0 / false.

    NULL-text documents report NULL / NULL — the module's NULL-metric
    contract (the boilerplate_span_stats rule): a document whose
    content is UNKNOWN cannot be certified leak-free, and a 0/false
    verdict is exactly what a decontamination filter must not hand it
    silently."""
    bsh = _shingle_set(bench, text_col, id_col, shingle_k) \
        .select("shingle").distinct()
    hits = (
        _shingle_set(docs, text_col, id_col, shingle_k)
        .join(F.broadcast(bsh), "shingle", "leftsemi")
        .groupBy(id_col).agg(F.count("*").alias("n_bench_shingles"))
    )
    has_text = F.col(text_col).isNotNull()
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_bench_shingles",
                    F.when(has_text,
                           F.coalesce(F.col("n_bench_shingles"),
                                      F.lit(0))))
        .withColumn("contaminated",
                    F.when(has_text,
                           F.col("n_bench_shingles") >= min_shared))
    )
