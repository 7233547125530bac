"""round-15 mirror-faithfulness harness: the doc-gate pipelines run on
a RANDOM DIRTY corpus (NULL texts, empty strings, 1-2-token docs,
leading/trailing/double spaces, exact duplicates) and the Spark side
must equal the gate's own DuckDB oracle SQL — shapes the fixed
testdata corpus never exercises.

This is the both-sides-drift failure the driver's hash cannot see:
before this harness, the minhash oracle banded degenerate docs the
engine excludes (all-pairs explosion on short-doc corpora), the
simhash oracle gave every NULL-text doc signature 0 (one collapsed
bucket + all-pairs), and the fingerprint oracle fabricated
fingerprint 0 / n_bigrams 0 for NULL text where the engine keeps the
NULL-metric contract. All three were corpus-masked."""

import os
import random
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

WORDS = ["the", "cat", "sat", "mat", "dog", "ran", "fast", "data",
         "spark", "hello", "world", "a", "b", "I", "don't", "x1",
         "2024", "--", "...", "e.g.", "co-op", "$5", "50%", "foo_bar"]

GATES = ["doc_exact_dedup", "doc_fingerprint", "doc_ngram_jaccard",
         "doc_minhash_lsh", "doc_simhash", "doc_langid",
         "doc_token_counts", "doc_quality"]


def _dirty_corpus(seed: int, n: int = 250) -> pd.DataFrame:
    rng = random.Random(seed)

    def text():
        r = rng.random()
        if r < 0.05:
            return None
        if r < 0.10:
            return ""
        if r < 0.15:
            return rng.choice(WORDS)
        if r < 0.20:
            return " ".join(rng.choice(WORDS) for _ in range(2))
        t = " ".join(rng.choice(WORDS)
                     for _ in range(rng.randrange(3, 40)))
        if rng.random() < 0.1:
            t += "  "
        if rng.random() < 0.1:
            t = " " + t
        return t

    rows = [(i, text()) for i in range(n)]
    for i in range(0, n, 7):          # exact duplicates
        rows[i] = (rows[i][0], rows[rng.randrange(n)][1])
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    # the full real-table schema so every doc gate can run
    langs = ["en", "fr", "es", "de", "zh", None]
    df["lang"] = [rng.choice(langs) for _ in range(n)]
    df["source"] = [rng.choice(["src0", "src1", "src2", None])
                    for _ in range(n)]
    df["n_chars"] = [len(t) if t is not None else 0 for t in df["text"]]
    return df


@pytest.mark.parametrize("gate", GATES)
def test_doc_gates_match_their_oracles_on_dirty_corpus(
        spark, tmp_path, gate):
    import __spark_entry__ as E
    from check_oracle import normalize

    docs = _dirty_corpus(20260816)
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'")

    sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()[gate]).df()
    a, b = normalize(sdf), normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  rtol=1e-9, atol=1e-12)
