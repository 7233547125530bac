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


def _emb_corpus(seed: int, dirty: bool, n: int = 200,
                dim: int = 64) -> pd.DataFrame:
    import numpy as np

    rng = np.random.default_rng(seed)
    py = random.Random(seed)
    rows = []
    for i in range(n):
        r = py.random()
        if dirty and i >= 50 and r < 0.04:
            v = None                               # NULL embedding
        elif dirty and i >= 50 and r < 0.08:
            v = [0.0] * dim                        # zero vector
        elif dirty and i >= 50 and r < 0.12:
            # NaN in an object-typed list — pyarrow writes these as
            # NULL ELEMENTS, the shape that found _searchable
            w = rng.standard_normal(dim).astype("float32")
            w[py.randrange(dim)] = float("nan")
            v = w.tolist()
        else:
            v = rng.standard_normal(dim).astype("float32").tolist()
        rows.append((i, v, py.randrange(4)))
    for i in range(50, n, 9):                      # exact duplicates
        rows[i] = (rows[i][0], rows[py.randrange(n)][1], rows[i][2])
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


#: dirty-corpus faithful gates; the ann gates' dim/pq SUB-ARMS keep
#: degenerate-free assumptions (per-component stats and adc encodings
#: of degenerate vectors differ in documented minutiae) and are locked
#: on random CLEAN corpora instead — their PAIR/TOP-K arms share the
#: exclusion rule tested here
EMB_DIRTY = ["emb_cosine_topk", "emb_neardup"]
EMB_CLEAN = ["emb_cosine_topk", "emb_neardup", "emb_ann_lsh",
             "emb_ann_ivf"]


@pytest.mark.parametrize("gate,dirty", [(g, True) for g in EMB_DIRTY]
                         + [(g, False) for g in EMB_CLEAN])
def test_emb_gates_match_their_oracles_on_random_corpus(
        spark, tmp_path, gate, dirty):
    """round-15: the embeddings gate pipelines vs their own DuckDB
    mirrors on random corpora — dirty (NULL vectors, zero vectors,
    NULL-element vectors from pyarrow's NaN-in-object-list conversion,
    exact duplicates) for the fully-faithful gates, clean-random for
    all four. The dirty sweep found: the oracles crashed outright on
    NULL embeddings (DuckDB list_cosine refuses NULL elements), the
    engine's search plane admitted NULL-ELEMENT vectors through the
    signature arms (_searchable now excludes them at the source), the
    oracle universe wrongly excluded ZERO vectors the engine trains
    and cell-assigns (DuckDB scores them cosine -1.0, below every
    threshold — output-equivalent), and semantic_dedup's keep-every-
    row contract needed mirror keep-rows for degenerate docs."""
    import __spark_entry__ as E
    from check_oracle import normalize

    emb = _emb_corpus(20260816 if dirty else 7, dirty)
    emb.to_parquet(str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet'")
    sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()[gate]).df()
    a, b = normalize(sdf), normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  rtol=1e-6, atol=1e-9)
