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
    buckets, 'test' for the next ``test_pct``, 'train' otherwise.

    A NULL id has no deterministic identity, so its ``split`` is NULL
    — NOT 'train': the unguarded otherwise-arm silently funneled every
    NULL-id row into the training set (the one place a row of unknown
    provenance must never land by default), while :func:`hash_sample`
    EXCLUDED the same rows — two membership rules for one module.
    Callers filtering ``split = 'train'`` therefore exclude NULL-id
    rows, consistently with the samplers."""
    if not 0 <= val_pct + test_pct <= 100:
        raise ValueError("val_pct + test_pct must be within [0, 100]")
    b = _hash_bucket(F.col(id_col), seed)
    return df.withColumn(
        "split",
        F.when(b < val_pct, "val")
        .when(b < val_pct + test_pct, "test")
        .when(b.isNotNull(), "train"),
    )


def hash_sample(df: DataFrame, pct: int, id_col: str = "doc_id",
                seed: str = "sample1") -> DataFrame:
    """Keep a deterministic ``pct``-percent sample by id hash (the
    repeatable alternative to ``df.sample``)."""
    if not 0 < pct <= 100:
        raise ValueError("pct must be in (0, 100]")
    return df.filter(_hash_bucket(F.col(id_col), seed) < pct)


def token_pack(df: DataFrame, budget: int, tokens_col: str = "ws_tokens",
               id_col: str = "doc_id", shard_col: "Column | None" = None,
               n_shards: int = 1024) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs.

    Documents pack greedily in id order WITHIN a shard (running token
    total via a per-shard window; pack = the budget bin the document
    STARTS in). Sharding is what makes this scale — packing is
    inherently sequential, so real pipelines pack per shard rather than
    globally, and each shard's window is an independent partition. The
    default shard key is an md5 bucket of the id (deterministic).

    Adds ``shard``, ``pack_id`` (per-shard bin), ``pack_offset`` (token
    offset of this document inside its shard's running stream).
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = (shard_col if shard_col is not None
             else _hash_bucket(F.col(id_col), "pack1", n_shards))
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col(id_col))
    start = (F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col))
    return (
        out.withColumn("pack_id", F.floor(start / budget).cast("long"))
        .withColumn("pack_offset", (start % budget).cast("long"))
    )


def stratified_hash_sample(df: DataFrame, fractions: "dict[str, float]",
                           strata_col: str = "lang",
                           id_col: str = "doc_id",
                           default_frac: float = 0.0,
                           seed: str = "strat1") -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-mixing step of a
    training pipeline ("keep 100% of lang A, 10% of lang B, ...").

    Adds a ``sampled`` boolean: true when the row's md5 bucket (keyed on
    id + seed, NOT on the stratum, so changing one stratum's fraction
    never reshuffles another's membership) falls below its stratum's
    fraction. Strata missing from ``fractions`` use ``default_frac``.

    Pure expression: the fractions table is a literal CASE (mixing
    configs are dozens of entries), so this is a shuffle-free narrow map
    at any corpus size; filter on ``sampled`` to materialize the mix.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    if not 0.0 <= default_frac <= 1.0:
        raise ValueError("default_frac must be in [0, 1]")
    # 10000 buckets -> basis-point resolution, exact integer thresholds
    b = _hash_bucket(F.col(id_col), seed, 10000)
    thr = F.lit(int(round(default_frac * 10000)))
    for name in sorted(fractions):
        thr = F.when(F.col(strata_col) == name,
                     F.lit(int(round(fractions[name] * 10000)))
                     ).otherwise(thr)
    return df.withColumn("sampled", b < thr)


def _salted_topk(df: DataFrame, k: int, pri, gcols: list,
                 id_col: str, n_salts: int, rank_name: str) -> DataFrame:
    """The shared salted two-phase top-k scaffold of BOTH reservoir
    samplers (one definition so a fix to the salt derivation, ordering
    or pruning can never drift between them): priority column ``pri``
    ascending with id tie-break, phase 1 ranks within (group, md5-salt)
    and keeps k per slice, phase 2 ranks the <= k*n_salts survivors per
    group — provably lossless (each group's global top-k survives its
    salt's top-k). The three scratch names and the rank output are
    RESERVED on the input: overwriting a caller column of the same
    name would silently destroy its data, so a clash fails loudly."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    clash = sorted({"_rk", "_salt", "_pr", rank_name} & set(df.columns))
    if clash:
        raise ValueError(
            f"reservoir sampling reserves column name(s) {clash} for "
            "internal state / the rank output — the input DataFrame "
            "already has them and they would be silently overwritten "
            "and dropped; rename the caller columns first")
    salt = (F.conv(F.substring(F.col("_rk"), 9, 8), 16, 10)
            .cast("long") % n_salts)
    order = [F.col("_rk").asc(), F.col(id_col).asc()]
    partial = Window.partitionBy(*gcols, "_salt").orderBy(*order)
    final = Window.partitionBy(*gcols).orderBy(*order)
    return (df.withColumn("_rk", pri).withColumn("_salt", salt)
            .withColumn("_pr", F.row_number().over(partial))
            .filter(F.col("_pr") <= k)
            .withColumn(rank_name, F.row_number().over(final))
            .filter(F.col(rank_name) <= k)
            .drop("_rk", "_salt", "_pr"))


def stratified_reservoir_sample(df: DataFrame, k: int,
                                strata_col: str = "lang",
                                id_col: str = "doc_id",
                                seed: str = "resv1",
                                n_salts: int = 16) -> DataFrame:
    """Per-stratum FIXED-k subsample — the "exactly 10k docs per
    language" staple that fraction-based sampling cannot give (a
    fraction keeps a binomially-noisy count). Deterministic reservoir:
    instead of ``rand()``-reservoir semantics (run- and
    partitioning-dependent), every row's reservoir priority is
    ``md5(seed_id)`` and the stratum keeps the k smallest — a pure
    function of the data, identical on every engine and re-run, and
    SQL-mirrorable (one ORDER BY md5 window). A stratum with fewer
    than k rows keeps all of them. This is also the per-DOMAIN cap
    primitive ("at most N documents per host"): stratify on the
    canonical domain and k is the cap.

    Returns the kept rows with ``resv_rank`` (1..k within the stratum,
    ascending priority, ties broken by id). Rows with a NULL id are
    EXCLUDED — a NULL identity has no deterministic priority (and
    Spark sorts NULL first where the SQL mirror sorts it last, a
    cross-engine trap). Ids should be unique per stratum (the doc_id
    contract): the kept ID SET is deterministic regardless, but if an
    id occurs on several rows, which physical row represents it at the
    cutoff is arrival-dependent. Scale shape is the salted two-phase
    top-k of
    ``bm25_topk``: rank first within (stratum, salt) — each partial
    window sorts ~1/n_salts of the stratum, so one giant stratum is
    n_salts bounded sorts, not one — then the final per-stratum window
    ranks <= k * n_salts survivors. The two phases are provably
    lossless (each stratum's global top-k survives its salt's top-k),
    which the oracle verifies by mirroring with a SINGLE window.
    """
    rk = F.md5(F.concat(F.lit(f"{seed}_"),
                        F.col(id_col).cast("string")))
    return _salted_topk(df.filter(F.col(id_col).isNotNull()),
                        k, rk, [strata_col], id_col, n_salts,
                        "resv_rank")


#: ticket ceiling for weighted_reservoir_sample — per-row work and the
#: per-row ticket array are O(weight); a mis-quantized weight column
#: (micro-units instead of small integers) must raise LOUDLY instead
#: of building million-element arrays per row (the MAX_GROUP_MEMBERS
#: precedent). Raise deliberately if coarse weights genuinely need it.
MAX_SAMPLE_WEIGHT = 1024


def weighted_reservoir_sample(df: DataFrame, k: int, weight_col: str,
                              strata_col: "str | None" = None,
                              id_col: str = "doc_id",
                              seed: str = "wres1",
                              n_salts: int = 16) -> DataFrame:
    """Fixed-k WEIGHTED subsample ("prefer high-quality documents, but
    keep exactly k") — deterministic by the lottery-ticket rule: each
    unit of a row's INTEGER weight buys one independent md5 ticket
    (``md5(seed_id_c)`` for copy c), the row's priority is its BEST
    (minimum) ticket, and the k smallest priorities win. More tickets
    → stochastically smaller minimum → weight-proportional selection
    pressure, with every comparison an exact string compare — no
    ``pow``/``ln`` priority keys, whose 1-ulp cross-engine drift could
    flip a rank (the reason A-ES/Efraimidis keys are not gate-safe
    here). A pure function of the data: identical on every engine,
    re-run and partitioning, and SQL-mirrorable.

    Weights are the CALLER's quantization contract (like
    :func:`~fstd2pandas_spark.operators.linfit.group_linfit` inputs):
    integer column, ``1 <= w <= MAX_SAMPLE_WEIGHT`` enforced by an
    in-plan raise — per-row work is O(weight), so micro-unit weights
    must rescale, not silently explode. NULL-weight and NULL-id rows
    are excluded (no tickets / no identity). ``strata_col=None``
    samples globally; otherwise k per stratum. Returns kept rows with
    ``wresv_rank`` (1..k, ascending priority, ties by id); a stratum
    with fewer than k eligible rows keeps all of them. Tie economics:
    one ROW's tickets can never tie each other (distinct ``_c``
    suffixes hash distinct strings), and two different rows' best
    tickets tie only on a full md5 collision (~2^-128) — in that
    measure-zero event the deterministic id tie-break still yields one
    stable order. Scale shape = the salted two-phase top-k of
    :func:`stratified_reservoir_sample` over a shuffle-free narrow
    ticket map."""
    if k < 1:
        raise ValueError("k must be >= 1")
    t = dict(df.dtypes).get(weight_col)
    if t not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{weight_col} must be an integer column (got {t}) — "
            "weight quantization is the caller's contract")
    w = F.col(weight_col)
    bad = F.concat(
        F.lit(f"weighted_reservoir_sample: weight {weight_col} = "),
        w.cast("string"),
        F.lit(f" outside [1, MAX_SAMPLE_WEIGHT={MAX_SAMPLE_WEIGHT}] — "
              "per-row work is O(weight); rescale the quantization or "
              "raise fstd2pandas_spark.operators.llm.sampling."
              "MAX_SAMPLE_WEIGHT deliberately"))
    w_ok = F.when((w >= 1) & (w <= F.lit(MAX_SAMPLE_WEIGHT)), w) \
            .otherwise(F.raise_error(bad).cast(t))
    pri = F.array_min(F.transform(
        F.sequence(F.lit(1), w_ok.cast("int")),
        lambda c: F.md5(F.concat(F.lit(f"{seed}_"),
                                 F.col(id_col).cast("string"),
                                 F.lit("_"), c.cast("string")))))
    return _salted_topk(
        df.filter(F.col(id_col).isNotNull()
                  & F.col(weight_col).isNotNull()),
        k, pri, [strata_col] if strata_col else [], id_col, n_salts,
        "wresv_rank")


def temperature_mix_sample(df: DataFrame, alpha: float = 0.5,
                           source_col: str = "source",
                           id_col: str = "doc_id",
                           seed: str = "temp1") -> DataFrame:
    """Temperature-based corpus mixing — the T5/LLaMA multi-source
    sampling rule: source ``s`` with ``n_s`` documents is sampled
    proportional to ``n_s^alpha`` (``alpha < 1`` up-weights small
    sources), realized as a per-document keep fraction
    ``f_s = (n_s / n_min)^(alpha - 1)`` so the smallest source keeps
    100% and expected kept counts are proportional to ``n_s^alpha``.
    Adds ``temp_thr`` (the source's basis-point threshold) and
    ``temp_sampled`` (deterministic md5-bucket keep, same keying
    discipline as :func:`stratified_hash_sample`).

    Scale shape: one sources-sized count aggregation (map-side
    combined), thresholds broadcast back onto the corpus, keep decision
    a narrow map — no corpus-sized shuffle.

    Cross-engine exactness: at the default ``alpha = 0.5`` the fraction
    is ``sqrt(n_min / n_s)`` — IEEE sqrt and division are correctly
    rounded in every engine, so the basis-point threshold is
    bit-identical and an SQL oracle gates membership exactly. Other
    alphas go through ``pow`` (documented 1-ulp cross-engine caveat,
    only observable when a threshold lands within ~1e-12 of a
    half-basis-point boundary).

    A NULL source is ITS OWN stratum (the groupBy already counts it as
    one group; the threshold joins back null-safely) — with a plain
    equality join, NULL-source rows influenced every OTHER source's
    threshold through ``n_min`` (a small unknown-source group could BE
    the minimum) while receiving no threshold themselves."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    counts = df.groupBy(F.col(source_col).alias("_src")).agg(
        F.count("*").alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    if alpha == 0.5:
        frac = F.sqrt(F.col("_nmin").cast("double") / F.col("_n"))
    else:
        frac = F.pow(F.col("_n").cast("double") / F.col("_nmin"),
                     F.lit(float(alpha) - 1.0))
    thr = (
        counts.crossJoin(F.broadcast(nmin))
        .select("_src",
                F.round(F.lit(10000) * frac, 0).cast("long")
                .alias("temp_thr"))
    )
    b = _hash_bucket(F.col(id_col), seed, 10000)
    return (
        df.join(F.broadcast(thr), df[source_col].eqNullSafe(thr["_src"]),
                "left")
        .drop("_src")
        .withColumn("temp_sampled", b < F.col("temp_thr"))
    )


def chunk_documents(df: DataFrame, chunk_tokens: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking — the standard long-document
    preparation step before tokenization: windows of ``chunk_tokens``
    whitespace tokens advancing by ``chunk_tokens - overlap``, so
    consecutive chunks share ``overlap`` tokens of context.

    ``n_chunks = 1 if n <= chunk else 1 + ceil((n - chunk) / stride)``
    (every token is covered; the final window may be short).  Output:
    one row per chunk with ``chunk_id`` (0-based), ``chunk_text`` and
    ``chunk_n_tokens`` alongside the document's other columns.

    Pure narrow map + Generate (explode): no shuffle at any corpus
    size; the row blow-up is bounded by total-tokens / stride.
    """
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens > overlap >= 0")
    stride = chunk_tokens - overlap
    # NULL text must not silently DELETE the row (explode(NULL) drops
    # it); treat as empty -> one empty chunk, keeping the op 1:1-safe
    tk = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    from fstd2pandas_spark.operators.llm.text import size_col
    n = size_col(tk)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - chunk_tokens) / F.lit(stride)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(F.slice(tk, i * stride + 1, chunk_tokens), " ")
            .alias("chunk_text"),
            F.least(n - i * stride, F.lit(chunk_tokens)).cast("int")
            .alias("chunk_n_tokens"),
        ),
    )
    return (
        df.withColumn("_c", F.explode(chunks))
        .select("*", "_c.chunk_id", "_c.chunk_text", "_c.chunk_n_tokens")
        .drop("_c")
    )
