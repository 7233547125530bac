"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (it has none of these), this package
adds the operators a 100 TB LLM-data pipeline needs, on the same
DataFrame model:

- :mod:`text`       — language-ID, quality scoring, token counting,
                      document fingerprinting
- :mod:`dedup`      — exact (raw + normalized), MinHash+LSH, SimHash,
                      n-gram Jaccard
- :mod:`cluster`    — near-dup connected components + canonical doc
- :mod:`similarity` — brute-force cosine top-k, LSH-bucketed ANN, IVF
                      ANN with deterministic Lloyd k-means refinement
- :mod:`decontam`   — benchmark shingle-overlap contamination flags
- :mod:`lm`         — CCNet-style bigram-LM perplexity scoring with
                      stupid backoff (head/middle/tail bucketing)
- :mod:`retrieval`  — Okapi BM25 keyword retrieval (broadcast query
                      terms, salted two-phase top-k)
- :mod:`sampling`   — deterministic hash split/sample + sequence packing
- :mod:`multimodal` — binary columns with REAL pure-numpy PPM/BMP
                      decode/resize; content-hash fallback for formats
                      needing external codecs

Determinism contract: every hash used here is md5-derived so the exact
same results are computable in ANSI SQL (the DuckDB oracle) — no
engine-specific hash functions in any correctness-gated path.
"""

from fstd2pandas_spark.operators.llm.text import (
    tokens_col, shingles_col, token_hash_col,
    language_id, quality_score, token_counts, fingerprint, simhash,
    repetition_metrics, gopher_filter,
)
from fstd2pandas_spark.operators.llm.scrub import (
    pii_counts, redact_pii, url_metrics,
)
from fstd2pandas_spark.operators.llm.dedup import (
    exact_dedup, multi_exact_dedup, normalized_exact_dedup, minhash_signature,
    lsh_candidate_pairs, ngram_jaccard_pairs, simhash_buckets,
    dedup_lines, boilerplate_span_stats, simhash_hamming_pairs,
    simhash_report, duplicate_spans,
)
from fstd2pandas_spark.operators.llm.cluster import (
    neardup_components, canonical_docs,
)
from fstd2pandas_spark.operators.llm.decontam import contamination_overlap
from fstd2pandas_spark.operators.llm.sampling import (
    hash_split, hash_sample, token_pack, stratified_hash_sample,
    chunk_documents, temperature_mix_sample, stratified_reservoir_sample,
    weighted_reservoir_sample,
)
from fstd2pandas_spark.operators.llm.classifier import (
    linear_text_classifier, token_bucket_col,
)
from fstd2pandas_spark.operators.llm.similarity import (
    cosine_topk, lsh_ann_topk, ivf_ann_topk, cosine_col, embedding_neardup,
    pq_train, pq_encode, pq_adc_topk, ivf_pq_topk, random_projection,
    embedding_dim_stats, int8_quantize,
    semantic_dedup,
)
from fstd2pandas_spark.operators.llm.ingest import (
    read_warc, read_warc_stream, strip_html, html_to_text_col,
)
from fstd2pandas_spark.operators.llm.bpe import (
    bpe_train, bpe_token_counts,
)
from fstd2pandas_spark.operators.llm.lm import (
    lm_train, lm_perplexity,
)
from fstd2pandas_spark.operators.llm.retrieval import (
    bm25_scores, bm25_topk, doc_postings,
)
from fstd2pandas_spark.operators.llm.multimodal import (
    extract_features, resize_images, sample_video_frames,
    image_dhash, audio_spectrum,
)
from fstd2pandas_spark.operators.llm.mp3 import mp3_metadata, parse_mp3
from fstd2pandas_spark.operators.llm.dedup import (
    signature_hamming_pairs, simhash_report_rows,
)

__all__ = [
    "tokens_col", "shingles_col", "token_hash_col", "language_id",
    "quality_score", "token_counts", "fingerprint", "simhash",
    "repetition_metrics", "gopher_filter",
    "pii_counts", "redact_pii", "url_metrics",
    "exact_dedup", "multi_exact_dedup", "normalized_exact_dedup", "minhash_signature",
    "lsh_candidate_pairs", "ngram_jaccard_pairs", "simhash_buckets",
    "dedup_lines", "boilerplate_span_stats", "simhash_hamming_pairs",
    "simhash_report", "duplicate_spans",
    "pq_train", "pq_encode", "pq_adc_topk", "ivf_pq_topk",
    "random_projection", "embedding_dim_stats", "int8_quantize",
    "read_warc", "read_warc_stream", "strip_html", "html_to_text_col",
    "bpe_train", "bpe_token_counts",
    "lm_train", "lm_perplexity",
    "bm25_scores", "bm25_topk", "doc_postings",
    "neardup_components", "canonical_docs", "contamination_overlap",
    "hash_split", "hash_sample", "token_pack", "stratified_hash_sample",
    "chunk_documents",
    "cosine_topk", "lsh_ann_topk", "ivf_ann_topk", "cosine_col", "embedding_neardup",
    "extract_features", "resize_images", "sample_video_frames",
    "image_dhash", "audio_spectrum", "mp3_metadata", "parse_mp3",
    "signature_hamming_pairs",
    "simhash_report_rows", "temperature_mix_sample",
    "stratified_reservoir_sample", "weighted_reservoir_sample",
    "linear_text_classifier", "token_bucket_col", "semantic_dedup",
]
