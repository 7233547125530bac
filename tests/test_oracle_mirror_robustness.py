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

# full-corpus robustness harness (~10 min of the suite's wall-clock):
# `pytest -m "not slow"` keeps the operator suites as the fast
# pre-commit inner loop; CI (and the pre-round check) runs everything
pytestmark = pytest.mark.slow

WORDS = ["the", "cat", "sat", "mat", "dog", "ran", "fast", "data",
         "spark", "hello", "world", "a", "b", "I", "don't", "x1",
         "2024", "--", "...", "e.g.", "co-op", "$5", "50%", "foo_bar"]

GATES = ["doc_exact_dedup", "doc_fingerprint", "doc_ngram_jaccard",
         "doc_minhash_lsh", "doc_simhash", "doc_langid",
         "doc_token_counts", "doc_quality",
         # round 16: the multimodal plumbing gate is documents-driven
         # too (text -> opaque binary payload -> mapInPandas features)
         "mm_features"]


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


# ---------------------------------------------------------------------------
# round 16: the FST multi-join mirrors (fst_vctype, fst_grid_assoc,
# fst_metadata_cleanup) — the most complex oracle SQL in the entry —
# on RANDOM DIRTY record tables: NULL nomvar/typvar/etiket, duplicate
# meta rows, orphan grids (meta-only grid 100, data-only grid 101),
# multiple HY rows, randomly missing P0/PT. The gate bodies and their
# oracle SQL are parameterized by the records relation
# (__spark_entry__._vctype_gate/_vctype_oracle_sql etc.), so the
# harness runs the IDENTICAL pipelines on the swapped-in corpus.

_META_VARS = ["!!", "P0", "PT", "HY", ">>", "^^", "^>", "!!SF"]
_DATA_VARS = ["TT", "UU", "HU", "GZ"]
#: decoded kinds: 0 (old>12000), 1 (old 2000..12000 / new k1),
#: 2 (old <2000 / new k2), 5 (new hybrid)
_IP1S = [0, 500, 850, 1195, 12000, 32000,
         95221840, 27762976, 41819464, 75597472]
_VCODES = [0, 1001, 1002, 2001, 5001, 5005, 21001]

#: the 12-column meta-records schema the vctype/grid_assoc gates take
_REC12 = ["key", "nomvar", "etiket", "ip1", "dateo", "deet", "npas",
          "ni", "nj", "d", "grid", "ig1"]

_REC_CASTS = {
    "key": "bigint", "nomvar": "string", "etiket": "string",
    "ip1": "int", "dateo": "bigint", "deet": "int", "npas": "int",
    "ni": "int", "nj": "int", "d": "array<float>", "grid": "int",
    "ig1": "int", "typvar": "string", "nk": "int", "ip2": "int",
    "ip3": "int", "ig2": "int", "ig3": "int", "ig4": "int",
    "nbits": "int", "datyp": "int", "grtyp": "string",
    "datev": "bigint",
}


def _dirty_fst_records(seed: int, n: int = 300) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.05:
            nomvar = None          # NULL nomvar: a DATA row per F7
        elif r < 0.45:
            nomvar = rng.choice(_META_VARS)   # heavy meta share
        else:
            nomvar = rng.choice(_DATA_VARS)
        if rng.random() < 0.08:
            # orphan grids: 100 carries ONLY descriptors, 101 ONLY data
            grid = 100 if nomvar in _META_VARS else 101
        else:
            grid = rng.randrange(5)
        ni = rng.randrange(1, 4)
        rows.append(dict(
            key=i, nomvar=nomvar,
            etiket=rng.choice(["ET1", "ET2", None]),
            ip1=rng.choice(_IP1S),
            dateo=rng.choice([0, 100, 200]),
            deet=rng.choice([0, 6]), npas=rng.choice([0, 12]),
            ni=ni, nj=1,
            # dyadic values so the float32 record payload is exact
            d=[rng.randrange(-80, 800) / 4.0 for _ in range(ni)],
            grid=grid,
            ig1=rng.choice(_VCODES) if nomvar == "!!" else 0,
            typvar=rng.choice(["P", "X", None]),
            nk=1, ip2=rng.choice([0, 6]), ip3=0,
            ig2=rng.randrange(3), ig3=0, ig4=0,
            nbits=rng.choice([16, 32]), datyp=rng.choice([5, 134]),
            grtyp="Z",
        ))
    # duplicate records under FRESH keys (keys stay unique so the
    # min-key / limit-1 picks are deterministic on both sides)
    for j in range(n // 10):
        dup = dict(rng.choice(rows[:n]))
        dup["key"] = n + j
        rows.append(dup)
    df = pd.DataFrame(rows)
    df["datev"] = df["dateo"] + df["deet"] * df["npas"]
    return df


def _fst_setup(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    pdf = _dirty_fst_records(seed)
    path = str(tmp_path / "records.parquet")
    pdf.to_parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW records AS SELECT * FROM '{path}'")
    rec = spark.read.parquet(path).select(
        *[F.col(c).cast(t).alias(c) for c, t in _REC_CASTS.items()])
    return rec, con


def _fst_compare(sdf, odf):
    from check_oracle import normalize

    a, b = normalize(sdf), normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  rtol=1e-9, atol=1e-12)


FST_SEEDS = [11, 22, 33]


#: every registry gate whose input is constructed from lineitem alone
#: (records_from_lineitem / meta_records_from_lineitem / _full_records)
FST_LINEITEM_GATES = [
    "fst_decode_ip", "fst_dates", "fst_meta_parse", "fst_stats",
    "fst_unit_convert", "fst_mask_apply", "fst_recover_apply",
    "fst_pressure_eta", "fst_pressure_hybrid", "fst_pressure_sigma",
    "fst_pressure_const", "fst_meta_exists", "fst_vctype",
    "fst_grid_assoc", "fst_select_meta", "fst_interval",
    "fst_metadata_cleanup", "fst_encode_ip", "fst_voir", "fst_cube",
    "fst_invariants", "fst_ip_info",
]


def _dirty_lineitem(seed: int, n_orders: int = 100) -> pd.DataFrame:
    """Random lineitem: a 1000x wider l_orderkey domain than the fixed
    corpus (stressing every modulo-derived record attribute), variable
    group sizes down to single-line orders, duplicate (linenumber,
    quantity) sort ties, and quantity extremes the fixed 1..50 domain
    never reaches — zero, negative, huge, fractional (all dyadic so
    the float32 payload cast is exact). NULL quantities are out of
    scope: a record's d is a dense decoded payload in the reference
    (numpy arrays hold no None; missing data travels as mask records),
    so a NULL array element has no reference analog."""
    rng = random.Random(seed)
    qtys = [0.0, 0.25, 1.0, 25.0, 25.25, 50.0, -7.5, 1024.0, 99999.75]
    rows = []
    for ok in rng.sample(range(0, 2_000_000), n_orders):
        nlines = rng.choice([1, 1, 2, 3, 4, 7])
        for ln in range(1, nlines + 1):
            # no l_shipdate: the fst gates never read it, and pandas
            # writes it as TIMESTAMP(NANOS), which Spark's reader
            # rejects outright
            rows.append(dict(
                l_orderkey=ok, l_partkey=rng.randrange(1000),
                l_suppkey=rng.randrange(100), l_linenumber=ln,
                l_quantity=rng.choice(qtys),
                l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                l_returnflag="N", l_linestatus="O"))
        if rng.random() < 0.3:           # duplicate-linenumber sort tie
            r = dict(rows[-1])
            r["l_quantity"] = rng.choice(qtys)
            rows.append(r)
    return pd.DataFrame(rows)


@pytest.mark.parametrize("gate", FST_LINEITEM_GATES)
def test_fst_gates_match_their_oracles_on_random_lineitem(
        spark, tmp_path, gate):
    """round 16: the full lineitem-derived gate roster vs its own
    oracles on the random corpus — the same both-sides-drift probe the
    doc/emb/multi-join planes got, now over every records-derived
    mirror in one sweep."""
    import __spark_entry__ as E

    _dirty_lineitem(20260816).to_parquet(
        str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{tmp_path}/lineitem.parquet'")
    sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()[gate]).df()
    _fst_compare(sdf, odf)


#: events-derived gates: the batch rollup/sessions/funnel plane, the
#: per-user conditional-aggregation plane, and both streaming gates
EVENTS_GATES = ["events_hourly", "conditional_agg",
                "stream_events_hourly", "stream_running_extrema"]


def _dirty_events(seed: int, n: int = 800) -> pd.DataFrame:
    """Random events: wider user domain, NULL user_id/event_type/
    value/ts rows, unknown event types, duplicate per-user timestamps
    (funnel strictly-after ties), exact hour-boundary timestamps,
    dirty props JSON (missing k, null k, empty object, malformed, and
    NULL). Timestamps are whole MICROSECONDS so the engine's
    nanos->micros normalization is exact on both sides."""
    rng = random.Random(seed)
    types = ["view", "click", "purchase", "signup", "error",
             "weird", None]
    props = ['{"k": %d}', '{"k": null}', "{}", "not json", None]
    vals = [0.0, 0.25, 12.75, 123.44, -5.5, 99999.12, None]
    base_us = 1_704_067_200_000_000          # 2024-01-01 UTC
    rows = []
    last_ts_by_user: dict = {}
    for i in range(n):
        r = rng.random()
        uid = None if r < 0.03 else rng.randrange(40)
        if r >= 0.03 and rng.random() < 0.05 and uid in last_ts_by_user:
            ts_us = last_ts_by_user[uid]   # duplicate per-user ts
        elif rng.random() < 0.05:
            # exact hour boundary
            ts_us = base_us + rng.randrange(40 * 24) * 3_600_000_000
        else:
            ts_us = base_us + rng.randrange(40 * 86400) * 1_000_000 \
                + rng.randrange(1_000_000)
        if rng.random() < 0.02:
            ts = None
        else:
            ts = pd.Timestamp(ts_us, unit="us")
            if uid is not None:
                last_ts_by_user[uid] = ts_us
        p = rng.choice(props)
        if p is not None and "%d" in p:
            p = p % rng.randrange(-50, 200)
        rows.append(dict(event_id=i, ts=ts, user_id=uid,
                         event_type=rng.choice(types),
                         value=rng.choice(vals), props=p))
    df = pd.DataFrame(rows)
    # nullable Int64: None user_ids otherwise flip the column to
    # float64 and the parquet schema to DOUBLE (the real table is
    # BIGINT — '6.0' vs '6' in every stringified key)
    df["user_id"] = df["user_id"].astype("Int64")
    return df


@pytest.mark.parametrize("gate", EVENTS_GATES)
def test_events_gates_match_their_oracles_on_random_events(
        spark, tmp_path, gate):
    """round 16: the events plane (hour/session/funnel/cohort rollups,
    the per-user conditional-agg/trend/fingerprint/histogram/
    incremental plane, and both Structured Streaming gates) vs its own
    oracles on a random dirty events corpus."""
    import __spark_entry__ as E

    _dirty_events(20260816).to_parquet(
        str(tmp_path / "events.parquet"))
    # the streaming gate's signature-dedup arm also reads documents:
    # give it the doc harness's dirty corpus
    _dirty_corpus(20260816).to_parquet(
        str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet'")
    sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()[gate]).df()
    _fst_compare(sdf, odf)


def _dirty_orders(seed: int, n: int = 400,
                  null_groups: bool = False) -> pd.DataFrame:
    """Random orders for the maintenance-plane gate (dedup_keys):
    o_orderkey stays a PRIMARY KEY (the MERGE/SCD2 target contract) but
    the domain is 2000x wider than the fixed corpus, with keys 0..63
    always present so every modulo slice the gate's loud density
    assertions require (pk cells of %32<8, %64<8 incl. the %64==7 NULL
    partition) is populated; o_custkey is drawn from a tiny domain so
    dedup groups carry heavy duplication; prices span zero, negative,
    fractional-cent-exact and huge values (two-decimal and dyadic only
    — a half-cent exact .005 would probe the ENGINES' rounding modes,
    not the mirror). null_groups adds NULL o_custkey/o_orderstatus/
    o_orderpriority rows — NULL grouping keys through the whole
    merge/SCD2/compaction/feed plane."""
    rng = random.Random(seed)
    keys = list(range(0, 64)) + rng.sample(range(64, 3_000_000), n - 64)
    stats_ = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-LOW"]
    prices = [0.0, 0.25, 901.5, 123.44, 50000.78, -12.25, 9999999.12]
    rows = []
    for i, k in enumerate(keys):
        nullish = null_groups and i % 11 == 0
        rows.append(dict(
            o_orderkey=k,
            o_custkey=None if nullish else rng.randrange(20),
            o_orderstatus=None if nullish and i % 22 == 0
            else rng.choice(stats_),
            o_orderpriority=rng.choice(prios + ([None] if nullish else [])),
            o_totalprice=rng.choice(prices)))
    return pd.DataFrame(rows)


#: the remaining TPC-H-shaped gates (full lineitem columns + the
#: orders/customer/nation/region dim chain + events for the temporal
#: join arms)
TPCH_GATES = ["pricing_summary", "filter_project", "union_all_distinct",
              "join_semi_anti", "revenue_by_nation"]


def _dirty_tpch(seed: int, tmp_path) -> None:
    """Random TPC-H-ish tables: NULL group keys (returnflag/
    linestatus), NULL measures (quantity/discount/price), predicate
    BOUNDARY values (shipdate exactly at the Q1 cutoff and 1 us past
    it, discount exactly 0.05, quantity exactly 10/45), NULL join
    keys, dangling foreign keys (customers pointing at missing
    nations, orders at missing customers), and customers with no
    orders. Prices stay within DECIMAL(18,2); timestamps are whole
    microseconds."""
    rng = random.Random(seed)
    cutoff = pd.Timestamp("1998-09-02")
    ships = [None, cutoff, cutoff + pd.Timedelta(microseconds=1),
             pd.Timestamp("1995-03-15"), pd.Timestamp("1998-12-31")]
    flags = ["R", "A", "N", None]
    stats_ = ["O", "F", None]
    qtys = [None, 0.0, 9.75, 10.0, 25.0, 44.75, 45.0, 50.0, -3.25]
    discs = [None, 0.0, 0.05, 0.04, 0.1, 1.0]
    prices = [0.0, 0.25, 901.5, 123.44, 50000.78, -12.25, 12345678.99]
    li = []
    okeys = list(range(0, 64)) + rng.sample(range(64, 500000), 150)
    for ok in okeys:
        for ln in range(1, rng.choice([1, 2, 2, 3, 4]) + 1):
            li.append(dict(
                l_orderkey=ok,
                l_partkey=rng.choice([None] + [rng.randrange(2000)] * 9),
                l_suppkey=rng.randrange(100), l_linenumber=ln,
                l_quantity=rng.choice(qtys),
                l_extendedprice=rng.choice(prices),
                l_discount=rng.choice(discs), l_tax=0.0,
                l_returnflag=rng.choice(flags),
                l_linestatus=rng.choice(stats_),
                l_shipdate=rng.choice(ships)))
    lidf = pd.DataFrame(li)
    lidf["l_partkey"] = lidf["l_partkey"].astype("Int64")
    # microsecond timestamps: only the events table gets the
    # nanos-as-long normalization in the entry's _load; a NANOS
    # l_shipdate is rejected outright by Spark's parquet reader
    lidf.to_parquet(str(tmp_path / "lineitem.parquet"),
                    coerce_timestamps="us",
                    allow_truncated_timestamps=True)
    # orders: every lineitem okey + extra orderless keys; some orders
    # point at custkeys absent from customer
    orows = [dict(o_orderkey=ok, o_custkey=rng.randrange(60),
                  o_orderstatus=rng.choice(["O", "F", "P"]),
                  o_totalprice=rng.choice(prices),
                  o_orderdate=rng.choice(
                      [None, pd.Timestamp("1995-06-01"),
                       pd.Timestamp("1997-01-15")]),
                  o_orderpriority=rng.choice(["1-URGENT", "2-HIGH"]))
             for ok in okeys + [900000 + i for i in range(10)]]
    pd.DataFrame(orows).to_parquet(str(tmp_path / "orders.parquet"),
                                   coerce_timestamps="us",
                                   allow_truncated_timestamps=True)
    # customer: keys 0..79 — 60..79 have no orders (anti rows); some
    # nationkeys dangle past the nation table, some are NULL
    crows = [dict(c_custkey=c, c_name=f"C{c}" if c % 9 else None,
                  c_nationkey=None if c % 17 == 0
                  else rng.choice(list(range(25)) + [90, 91]),
                  c_acctbal=0.0, c_mktsegment="BUILDING")
             for c in range(80)]
    cdf = pd.DataFrame(crows)
    cdf["c_nationkey"] = cdf["c_nationkey"].astype("Int64")
    cdf.to_parquet(str(tmp_path / "customer.parquet"))
    nrows = [dict(n_nationkey=n, n_name=f"N{n}",
                  n_regionkey=(n % 5) if n % 11 else 9)  # 9 dangles
             for n in range(25)]
    pd.DataFrame(nrows).to_parquet(str(tmp_path / "nation.parquet"))
    pd.DataFrame([dict(r_regionkey=r, r_name=f"R{r}")
                  for r in range(5)]).to_parquet(
        str(tmp_path / "region.parquet"))
    _dirty_events(seed).to_parquet(str(tmp_path / "events.parquet"))


@pytest.mark.parametrize("gate", TPCH_GATES)
def test_tpch_gates_match_their_oracles_on_random_tables(
        spark, tmp_path, gate):
    """round 16: the TPC-H-shaped gates (Q1 decimal aggregation,
    pushdown filter/project, z-order union, semi/anti + asof/range
    temporal joins, the dim-chain revenue rollup) vs their oracles on
    random dirty tables."""
    import __spark_entry__ as E

    _dirty_tpch(20260816, tmp_path)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tmp_path}/{t}.parquet'")
    sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()[gate]).df()
    _fst_compare(sdf, odf)


@pytest.mark.parametrize("seed", [3, 33])
def test_window_topk_on_random_orders(spark, tmp_path, seed):
    """round 16: the widened window surface (rank / lag / lead /
    first_value / ntile over one window spec) vs DuckDB's native
    window functions on random orders — duplicate totalprice ties and
    extreme prices the fixed corpus never exercises."""
    import __spark_entry__ as E

    _dirty_orders(seed).to_parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"'{tmp_path}/orders.parquet'")
    sdf = E.queries()["window_topk"](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()["window_topk"]).df()
    _fst_compare(sdf, odf)


@pytest.mark.parametrize("seed,null_groups", [(3, False), (33, False),
                                              (3, True)])
def test_dedup_maintenance_plane_on_random_orders(
        spark, tmp_path, seed, null_groups):
    """round 16: the dedup_keys gate — the maintenance plane's single
    oracle (MERGE latest-wins/tombstone/insert, SCD2 history +
    point-in-time, physical compaction invariance, partition expiry
    incl. the NULL partition, the 2-generation CDC stream, and the
    snapshot-diff change feed) — vs its arithmetic oracle on random
    orders."""
    import __spark_entry__ as E

    _dirty_orders(seed, null_groups=null_groups).to_parquet(
        str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"'{tmp_path}/orders.parquet'")
    sdf = E.queries()["dedup_keys"](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()["dedup_keys"]).df()
    _fst_compare(sdf, odf)


def test_dirty_mirrors_hold_under_ansi(spark, tmp_path):
    """round 16: loudness/values must not depend on config (the
    size(NULL) class from round 15) — a representative cross-section
    of the dirty-corpus mirrors re-run under spark.sql.ansi.enabled =
    true: the dirtiest arithmetic (pricing decimals on NULL/extreme
    measures), the records plane's stats/mask folds on quantity
    extremes, and the JSON/regexp extraction plane. The prior config
    value is RESTORED (hardcoding 'false' here silently flipped every
    later test non-ANSI in round 15)."""
    import __spark_entry__ as E

    _dirty_tpch(20260816, tmp_path)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tmp_path}/{t}.parquet'")
    ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for gate in ("pricing_summary", "join_semi_anti",
                     "conditional_agg"):
            sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
            odf = con.execute(E.oracle_sql()[gate]).df()
            _fst_compare(sdf, odf)
        # the records plane re-reads lineitem, but with ITS corpus
        # (the TPC-H one carries NULL quantities, which the records
        # plane adjudicates out — a decoded d payload is dense)
        _dirty_lineitem(20260816).to_parquet(
            str(tmp_path / "lineitem.parquet"))
        con.execute("DROP VIEW lineitem")
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"'{tmp_path}/lineitem.parquet'")
        for gate in ("fst_stats", "fst_mask_apply"):
            sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
            odf = con.execute(E.oracle_sql()[gate]).df()
            _fst_compare(sdf, odf)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi0)


def _latlon_grid_ids(k: int) -> list[str]:
    """Python mirror of q_fst_latlon_all's grid-id construction: the
    grid ids key k contributes (its main grid, plus the '#' tile grid
    for Z keys). Used to sample COLLISION-FREE key sets: two distinct
    keys can map to the same concat(ig1, ig2) id (N/S have only six ig
    combos), and colliding DIFFERENT geometries resolve through the
    engine's per-grid content-hash representative pick — deterministic
    in the engine but not expressible in the SQL mirror, so the
    harness excludes that shape by construction (identical duplicates,
    the realistic multi-file shape, ARE tested via dup=True)."""
    gt = "ABGLZYENSU"[k % 10]
    lat0, lon0 = k - 12, k * 14 - 180
    if gt == "A":
        ig1 = k % 3
    elif gt in ("B", "G"):
        ig1 = 0
    elif gt == "L":
        ig1 = round((lat0 + 90) * 100)
    elif gt == "Z":
        ig1 = 3000 + k
    elif gt == "Y":
        ig1 = 4000 + k
    elif gt == "E":
        ig1 = (k % 60 - 30 + 90) * 100
    elif gt == "U":
        ig1 = 5000 + k
    else:
        ig1 = (k % 3 + 2) * 100
    if gt in ("A", "B", "G"):
        ig2 = 1000 + k
    elif gt == "L":
        ig2 = round((lon0 + 180) * 100)
    elif gt in ("Z", "Y"):
        ig2 = 500 + k
    elif gt == "E":
        ig2 = (k * 11 % 360) * 100
    elif gt == "U":
        ig2 = 600 + k
    else:
        ig2 = (k % 2 + 2) * 100
    ids = [f"{ig1}{ig2}"]
    if gt == "Z":                        # the '#' tile companion grid
        ids.append(f"{30000 + k}{700 + k}")
    return ids


@pytest.mark.parametrize("seed,dup", [(7, False), (77, False),
                                      (777, False), (7, True)])
def test_fst_latlon_mirror_on_random_nation(spark, tmp_path, seed, dup):
    """round 16: fst_latlon_all's oracle is a pure property mirror of
    the nation keys (every grid parameter derives from n_nationkey by
    formula), so the harness swaps in RANDOM keys 0..99 — a 4x larger
    k-domain than the fixed 25-key table, sweeping the per-grtyp trig
    seams (E rotated frames, N/S stereographic, '#' tile slices,
    U composites) and the C23 epsilon rules at values the fixed corpus
    never hits. Keys are sampled collision-free on grid id (see
    _latlon_grid_ids). The dup=True case duplicates keys — the SAME
    grid defined by several records, a real multi-file FST shape the
    engine collapses to one LA/LO pair per grid (found the missing
    DISTINCT in the oracle's g CTE). NULL keys are out of scope:
    nation is a TPC-H dimension with a primary key; a NULL-key grid
    definition has no reference analog."""
    import random as _random

    import __spark_entry__ as E

    rng = _random.Random(seed)
    keys, taken = [], set()
    for k in rng.sample(range(0, 100), 60):
        ids = _latlon_grid_ids(k)
        if not any(i in taken for i in ids):
            taken.update(ids)
            keys.append(k)
        if len(keys) == 30:
            break
    if dup:
        keys = keys + keys[:10]          # 10 duplicated grid definitions
    pdf = pd.DataFrame({
        "n_nationkey": keys,
        "n_name": [f"N{k}" for k in keys],
        "n_regionkey": [k % 5 for k in keys],
        "n_comment": ["x" for _ in keys],
    })
    pdf.to_parquet(str(tmp_path / "nation.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW nation AS SELECT * FROM "
                f"'{tmp_path}/nation.parquet'")
    sdf = E.queries()["fst_latlon_all"](spark, str(tmp_path)).toPandas()
    odf = con.execute(E.oracle_sql()["fst_latlon_all"]).df()
    _fst_compare(sdf, odf)


@pytest.mark.parametrize("seed", FST_SEEDS)
def test_fst_vctype_mirror_on_dirty_records(spark, tmp_path, seed):
    import __spark_entry__ as E

    rec, con = _fst_setup(spark, tmp_path, seed)
    sdf = E._vctype_gate(spark, rec.select(_REC12)).toPandas()
    odf = con.execute(
        E._vctype_oracle_sql("SELECT * FROM records")).df()
    _fst_compare(sdf, odf)


@pytest.mark.parametrize("seed", FST_SEEDS)
def test_fst_grid_assoc_mirror_on_dirty_records(spark, tmp_path, seed):
    import __spark_entry__ as E

    rec, con = _fst_setup(spark, tmp_path, seed)
    sdf = E._grid_assoc_gate(spark, rec.select(_REC12)).toPandas()
    odf = con.execute(
        E._grid_assoc_oracle_sql("SELECT * FROM records")).df()
    _fst_compare(sdf, odf)


@pytest.mark.parametrize("seed", FST_SEEDS)
def test_fst_metadata_cleanup_mirror_on_dirty_records(
        spark, tmp_path, seed):
    import __spark_entry__ as E

    rec, con = _fst_setup(spark, tmp_path, seed)
    sdf = E._meta_cleanup_gate(
        spark, rec.localCheckpoint(eager=True)).toPandas()
    odf = con.execute(
        E._meta_cleanup_oracle_sql("SELECT * FROM records")).df()
    _fst_compare(sdf, odf)


# --------------------------------------------------------------- round 17
# The roundtrip gates were the only oracle-gated family outside this
# harness (r16 verdict nit #1). This is their dirty analog: a RANDOM
# record table — NULL string metadata, extreme field values, duplicate
# records, every codec arm of the XDF cycle — driven through the real
# container (write_record_table(container="xdf") -> binary .fst files
# -> fstrec DataSource read) and compared against the DuckDB identity
# construction carrying the writer's documented canonicalizations:
# NULL strings pack as spaces and read back '' (never the text 'None'),
# a NULL grtyp packs as 'X' (never 'N', a real projection), and dateo
# is DERIVED from the stored valid-date stamp (the input dateo is
# deliberately garbage here to prove the derivation). mode="dump" skips
# metadata_cleanup — the cleanup plane has its own dirty-harnessed gate
# (fst_metadata_cleanup); this case isolates the CONTAINER.

#: the XDF roundtrip gate's (datyp, nbits) codec cycle
_XDF_DIRTY_CASES = [(5, 32), (134, 16), (129, 16), (1, 16), (133, 32),
                    (2, 16), (4, 16)]


def _dirty_writable_records(seed: int, n: int = 220) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        datyp, nbits = _XDF_DIRTY_CASES[i % len(_XDF_DIRTY_CASES)]
        ni = rng.randrange(1, 5)
        nj = rng.randrange(1, 3)
        m = ni * nj
        if datyp in (5, 133):
            # float arms: dyadic fractions and negatives are exact
            d = [rng.randrange(-800, 800) / 4.0 for _ in range(m)]
        elif datyp == 4:
            d = [float(rng.randrange(-200, 200)) for _ in range(m)]
        else:
            # quantized/packed arms: small non-negative ints are exact
            d = [float(rng.randrange(0, 200)) for _ in range(m)]
        rows.append(dict(
            key=i,
            nomvar=rng.choice(["TT", "UU", "GZ", "HU", None]),
            typvar=rng.choice(["P", "X", None]),
            etiket=rng.choice(["R1_V710_N", "ET", None]),
            ni=ni, nj=nj, nk=1,
            # deliberately-garbage dateo: the XDF directory stores only
            # the valid-date stamp; the read-back dateo must be DERIVED
            dateo=rng.randrange(0, 10**9),
            ip1=rng.choice([0, 1, 12000, (1 << 28) - 1,
                            rng.randrange(0, 1 << 28)]),
            ip2=i % 30, ip3=i,
            deet=rng.choice([0, 300, 3600]),
            npas=rng.choice([0, 1, 12, 100]),
            datyp=datyp, nbits=nbits,
            grtyp=rng.choice(["Z", "X", None]),
            ig1=rng.choice([0, (1 << 24) - 1, i % 90]),
            ig2=rng.choice([0, (1 << 24) - 1, i % 45]),
            ig3=0, ig4=i % 50,
            datev=442998800 + 10 * i + (i % 8),
            d=d, grid=i % 5,
        ))
    # duplicate full records under fresh identities (ip3/key unique)
    for j in range(n // 10):
        dup = dict(rng.choice(rows[:n]))
        dup["key"] = n + j
        dup["ip3"] = n + j
        rows.append(dup)
    return pd.DataFrame(rows)


_XDF_DIRTY_MIRROR_SQL = """
  WITH s AS (
    SELECT *, (datev // 10) * 8 + datev % 10 - (deet * npas) // 5 AS raw_o
    FROM records)
  SELECT coalesce(nomvar, '') AS nomvar, coalesce(typvar, '') AS typvar,
         coalesce(etiket, '') AS etiket, ni, nj, nk,
         (raw_o // 8) * 10 + raw_o % 8 AS dateo,
         ip1, ip2, ip3, deet, npas, datyp, nbits,
         CASE WHEN grtyp IS NULL OR grtyp = '' THEN 'X' ELSE grtyp END
           AS grtyp,
         ig1, ig2, ig3, ig4, datev,
         u.i - 1 AS pos, round(CAST(d[u.i] AS DOUBLE), 4) AS val
  FROM s, UNNEST(generate_series(1, len(d))) u(i)
  ORDER BY ip3, pos
"""


@pytest.mark.parametrize("seed", FST_SEEDS)
def test_fst_xdf_roundtrip_mirror_on_dirty_records(
        spark, tmp_path, seed):
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from fstd2pandas_spark.sources import register, write_record_table

    try:
        register(spark)
    except Exception:
        pass
    pdf = _dirty_writable_records(seed)
    src = str(tmp_path / "records.parquet")
    pdf.to_parquet(src)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW records AS SELECT * FROM '{src}'")
    wdf = spark.read.parquet(src).select(
        *[F.col(c).cast(t).alias(c) for c, t in _REC_CASTS.items()])
    out = str(tmp_path / "xdf_out")
    write_record_table(wdf, out, mode="dump", container="xdf",
                       overwrite=True)
    back = spark.read.format("fstrec").load(out)
    sdf = (back.select(*E._RT_META_COLS,
                       F.posexplode("d").alias("pos", "val"))
           .withColumn("val", F.round(F.col("val").cast("double"), 4))
           .orderBy("ip3", "pos")).toPandas()
    odf = con.execute(_XDF_DIRTY_MIRROR_SQL).df()
    _fst_compare(sdf, odf)


def test_dirty_mirrors_hold_under_nonutc_timezone(spark, tmp_path):
    """round 17: engine VALUES must not depend on
    spark.sql.session.timeZone — the config-independence contract the
    ANSI cross-section pins, extended to the clock. The temporal plane
    (hour buckets, session epochs, funnel step timestamps, cohort
    truncs, as-of/range joins, the per-user conditional-agg day/hour
    keys) previously routed NTZ wall times through the session TZ via
    unix_micros/unix_timestamp(NTZ->TZ cast): under America/New_York
    every epoch shifted by the UTC offset — and 2024-03-10 02:30 (a
    DST gap there) does not even exist as a local time. The operators
    now compute epochs from the wall-time fields directly
    (functions/timeutil.py), so the dirty events/TPC-H mirrors must
    match their UNCHANGED DuckDB oracles (naive-as-UTC) under a
    DST-observing negative-offset zone. The streaming gate pins a UTC
    session internally (watermarks are TIMESTAMP-typed by Spark's
    design) and is covered too — all 50 gates are config-independent.
    The prior config value is RESTORED (the ANSI-test rule)."""
    import __spark_entry__ as E

    _dirty_tpch(20260817, tmp_path)
    _dirty_events(20260817).to_parquet(
        str(tmp_path / "events.parquet"))
    # the streaming gate's signature-dedup arm reads documents too
    _dirty_corpus(20260817).to_parquet(
        str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{tmp_path}/{t}.parquet'")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # fst_dates pins the records plane: stamp decode is NTZ UTC
        # wall (old-format stamps via make_timestamp_ntz), the C14
        # zone shift uses convert_timezone with BOTH zones explicit,
        # and date_format over NTZ renders the wall — all previously
        # session-routed (date_local shifted 100% under NY)
        # stream_events_hourly: the gate pins a UTC session around
        # stream construction + materialization (watermarks are
        # session-zoned by Spark's design), so it too must match here
        for gate in ("events_hourly", "conditional_agg",
                     "join_semi_anti", "dedup_keys", "fst_dates",
                     "stream_events_hourly"):
            sdf = E.queries()[gate](spark, str(tmp_path)).toPandas()
            odf = con.execute(E.oracle_sql()[gate]).df()
            _fst_compare(sdf, odf)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
