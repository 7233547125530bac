"""Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
heavy-hitter / frequency sketch, engine-determinism-first.

At 100 TB exact per-key counts of a high-cardinality column (URLs,
tokens, user agents) need a shuffle keyed by that column; a Count-Min
sketch needs ONE map-side-combinable aggregation into depth x width
integer counters — kilobytes of state regardless of key cardinality —
and sketches from different partitions/days/streams MERGE by plain
addition. Estimates overcount only (min over depth rows bounds the
collision error), never undercount.

Determinism contract (what makes this oracle-gatable where probabilistic
sketch libraries are not): bucket hashes are md5-derived
(``cms{d}_{value}``), counters are integer sums — both
summation-order-free and bit-identical on any engine, partitioning, or
merge order. An SQL oracle rebuilds the exact counter matrix and the
exact estimates.

NULL keys are excluded on BOTH build and estimate (a NULL has no md5
bucket; silently routing it through NULL cells would undercount to 0 —
a contract violation — and DuckDB's NULL-skipping concat() could not
mirror it anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cms_bucket_col(value: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket of a value: first 8 md5 hex digits of
    ``cms{d}_{value}`` mod ``width``."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"cms{d}_"), value.cast("string"))), 1, 8),
        16, 10).cast("long") % width)


def _banded(key: Column, width: int, depth: int) -> Column:
    """The shared (d, bucket) banding array — ONE definition for build
    and estimate, so the two sides cannot silently desynchronize (a
    hash-salt edit applied to one would zero every estimate)."""
    return F.array(*[
        F.struct(F.lit(d).alias("d"),
                 cms_bucket_col(key, d, width).alias("bucket"))
        for d in range(depth)])


def countmin_counters(df: DataFrame, key_col: str, width: int = 1024,
                      depth: int = 4,
                      weight_col: "str | None" = None) -> DataFrame:
    """Build the sketch: (d, bucket, c, width, depth) rows — the
    non-zero cells of the depth x width counter matrix, with the
    parameters riding along so consumers can validate they estimate
    against the matrix they think they do. ONE aggregation, map-side
    combined, output bounded by depth*width regardless of key
    cardinality. ``weight_col`` counts weighted occurrences (e.g.
    bytes per URL) instead of rows."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    if weight_col:
        # a NULL weight would be SKIPPED by the sum — a silent
        # UNDERcount, the one direction a Count-Min must never err —
        # and a negative weight breaks the overcount-only min-estimate
        # invariant the same way; both raise in-plan
        wr = F.col(weight_col).cast("long")
        bad = F.concat(
            F.lit(f"countmin_counters: weight {weight_col} = "),
            F.coalesce(wr.cast("string"), F.lit("NULL")),
            F.lit(" — weights must be non-NULL and >= 0 (a NULL is "
                  "silently skipped by the sum and a negative weight "
                  "breaks the overcount-only invariant: both turn the "
                  "sketch into an undercounter)"))
        w = (F.when(wr >= 0, wr)
             .otherwise(F.raise_error(bad).cast("long")))
    else:
        w = F.lit(1).cast("long")
    rows = (df.filter(F.col(key_col).isNotNull())
            .select(F.explode(_banded(F.col(key_col), width, depth))
                    .alias("db"), w.alias("_w")))
    return (rows.groupBy("db.d", "db.bucket")
            .agg(F.sum("_w").alias("c"))
            .withColumn("width", F.lit(int(width)))
            .withColumn("depth", F.lit(int(depth))))


def merge_counters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth): cells add
    — the property that lets per-day / per-stream sketches combine
    without touching raw data. Parameter columns must agree (grouping
    on them makes a mismatched merge produce disjoint cells rather
    than silently mixed ones; validate with the estimate-side check)."""
    return (a.unionByName(b).groupBy("d", "bucket", "width", "depth")
            .agg(F.sum("c").alias("c")))


def countmin_estimate(counters: DataFrame, keys: DataFrame,
                      key_col: str, width: int, depth: int) -> DataFrame:
    """Estimated count for every DISTINCT non-NULL key in ``keys``:
    min over the depth rows of the key's counter cells (missing cells
    are 0). The counter side is depth*width-bounded, so it broadcasts;
    the keys side streams — estimating a billion keys is a narrow
    broadcast join.

    (width, depth) must match the sketch; the counters' own parameter
    columns are checked via a bounded distinct (the frame is at most
    depth*width rows per parameterization) so a mismatch fails loudly
    instead of silently estimating 0 for every key (an undercount, the
    one thing a Count-Min must never do). A mismatched merge_counters
    leaves DISJOINT (width, depth) groups coexisting in one frame — a
    single-row peek could land on the matching group and let min-over-
    depth mix cells from two parameterizations (an undercount), so the
    check demands exactly ONE distinct parameter pair."""
    params = [tuple(r) for r in
              counters.select("width", "depth").distinct().collect()]
    if len(params) > 1:
        raise ValueError(
            f"counters frame mixes {len(params)} (width, depth) "
            f"parameterizations {sorted(params)} — merge_counters of "
            "mismatched sketches is not estimable")
    if params and params[0] != (width, depth):
        raise ValueError(
            f"sketch was built with (width={params[0][0]}, "
            f"depth={params[0][1]}), estimate called with "
            f"({width}, {depth})")
    banded = (keys.filter(F.col(key_col).isNotNull())
              .select(F.col(key_col),
                      F.explode(_banded(F.col(key_col), width, depth))
                      .alias("db")))
    joined = banded.join(
        F.broadcast(counters),
        (banded["db.d"] == counters["d"])
        & (banded["db.bucket"] == counters["bucket"]), "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .cast("long").alias("cms_est")))


def countmin_heavy_hitters(counters: DataFrame, keys: DataFrame,
                           key_col: str, width: int, depth: int,
                           threshold: int) -> DataFrame:
    """Candidate keys whose estimated count >= ``threshold``. Because a
    Count-Min only ever OVERcounts, this never misses a true heavy
    hitter — no false negatives by construction; false positives are
    bounded by the sketch's collision error (shrink with ``width``).
    Same scale shape as the estimate: broadcast counters, streaming
    candidate side — finding heavy hitters among a billion candidate
    keys is one narrow broadcast join plus a filter."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    return (countmin_estimate(counters, keys, key_col, width, depth)
            .filter(F.col("cms_est") >= int(threshold)))


def hll_registers(df: DataFrame, key_col: str,
                  group_cols: "list[str] | None" = None,
                  p: int = 10) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): hash every
    non-NULL key, route it to one of ``m = 2**p`` registers by the
    first 32 md5 bits, and keep per register the MAX of
    (leading zeros of the next 32 bits) + 1. Returns (reg, max_rank,
    hll_p) — at most m rows however many distinct keys exist.

    Like :func:`linear_count_occupied`, the gated/deterministic part
    is the integer register table itself: md5-derived buckets and a
    max over integer ranks are summation-order-free and bit-identical
    on any engine or partitioning (rank = 33 - length of the minimal
    binary string of the 32-bit value, an integer/string expression
    DuckDB mirrors with ``bin()``), and register tables from
    disjoint corpora merge by plain ``GREATEST`` per register. The
    float estimate stays driver-side (:func:`hll_estimate`). One
    map-side-combinable aggregation, kilobytes of state —
    ``group_cols`` gives a register table per group (per-day /
    per-source cardinalities), m-bounded per group like
    :func:`linear_count_occupied`."""
    if p < 4 or p > 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    gcols = list(group_cols or [])
    h = F.md5(F.concat(F.lit("hll_"), F.col(key_col).cast("string")))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rank = (F.when(h2 == 0, F.lit(33))
            .otherwise(F.lit(33) - F.length(F.conv(h2, 10, 2)))
            .cast("int"))
    return (df.filter(F.col(key_col).isNotNull())
            .select(*gcols, (h1 % m).alias("reg"), rank.alias("_r"))
            .groupBy(*gcols, "reg")
            .agg(F.max("_r").alias("max_rank"))
            .withColumn("hll_p", F.lit(int(p))))


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: "list[str] | None" = None,
              p: int = 10) -> DataFrame:
    """Merge two register tables built with the same ``p``: MAX rank
    per (group, reg) — the merged table is EXACTLY the table of the
    union of the two key streams (max distributes over union), the
    roll-up property the module docstring promises and
    :func:`kmins_merge` already ships for its family. Groups/registers
    present on one side only pass through. The ``hll_p`` parameter
    columns are validated the bounded-distinct way (a mismatched p
    means different register SPACES — maxing them would silently
    estimate a garbage cardinality)."""
    gcols = list(group_cols or [])
    for side, name in ((a, "left"), (b, "right")):
        params = [r[0] for r in
                  side.select("hll_p").distinct().collect()]
        if len(params) > 1:
            raise ValueError(
                f"hll_merge: {name} side mixes {len(params)} p "
                f"parameterizations {sorted(params)}")
        if params and params[0] != p:
            raise ValueError(
                f"hll_merge: {name} side was built with "
                f"p={params[0]}, merge called with p={p}")
    return (a.unionByName(b)
            .groupBy(*gcols, "reg")
            .agg(F.max("max_rank").alias("max_rank"))
            .withColumn("hll_p", F.lit(int(p))))


def hll_estimate(registers: "list[tuple[int, int]]", p: int) -> float:
    """Driver-side HLL cardinality estimate from (reg, max_rank) rows
    (absent registers count as 0): the classic alpha_m * m^2 /
    sum(2^-M_j) with the small-range linear-counting fallback and the
    32-bit large-range correction — the float arithmetic stays OUT of
    the cross-engine contract, exactly like
    :func:`linear_count_estimate`."""
    import math

    m = 1 << p
    ranks = [0] * m
    for reg, r in registers:
        if not 0 <= reg < m:
            raise ValueError(f"register {reg} out of range for p={p}")
        ranks[reg] = max(ranks[reg], r)
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    est = alpha * m * m / sum(2.0 ** -r for r in ranks)
    if est <= 2.5 * m:
        zeros = ranks.count(0)
        if zeros:
            return m * math.log(m / zeros)
    if est > (1 << 32) / 30.0:
        return -(1 << 32) * math.log(1.0 - est / (1 << 32))
    return est


def _bloom_positions(key_col: str, m: int, k: int):
    """The k md5-derived bit positions of a key — ONE definition
    shared by build and probe, because a salt/slice/width drift
    between the two sides would silently break the filter's
    no-false-negative contract (the probe would look at positions the
    build never set)."""
    return F.array(*[
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"bloom{j}_"),
                           F.col(key_col).cast("string"))), 1, 8),
            16, 10).cast("long") % m)
        for j in range(k)])


def bloom_bits(df: DataFrame, key_col: str, m: int = 8192,
               k: int = 4) -> DataFrame:
    """Bloom filter (Bloom 1970) as its SET-bit table: each non-NULL
    key sets ``k`` md5-derived positions (salt ``bloom{j}_``) in an
    ``m``-bit space; the filter is the distinct (bit) rows — at most m
    of them however many keys went in. Filters over disjoint corpora
    merge by plain union+distinct.

    This is the decontamination primitive at 100 TB: build the filter
    over the benchmark/test set once (m-bounded kilobytes), broadcast
    it, and probe a billion training documents with a narrow join —
    no false negatives by construction (a contaminated doc can never
    slip through), false positives at the classic (1-e^{-kn/m})^k
    rate, tunable by m. Deterministic integers end to end: an SQL
    oracle rebuilds the exact bit set."""
    if m < 1 or k < 1:
        raise ValueError("m and k must be >= 1")
    pos = _bloom_positions(key_col, m, k)
    return (df.filter(F.col(key_col).isNotNull())
            .select(F.explode(pos).alias("bit"))
            .distinct()
            .withColumn("bloom_m", F.lit(int(m)))
            .withColumn("bloom_k", F.lit(int(k))))


def bloom_merge(a: DataFrame, b: DataFrame, m: int, k: int) -> DataFrame:
    """Merge two bit tables built with the same (m, k): plain
    union+distinct — the merged filter is EXACTLY the filter of the
    union of the two key sets (set-bit union distributes over key
    union), completing the validated-merge family (kmins_merge /
    hll_merge / merge_counters). The (m, k) parameter columns are
    validated the bounded-distinct way on BOTH sides: a mismatched
    merge would mix positions from different bit spaces, and the
    resulting filter could report FALSE NEGATIVES — the one thing a
    Bloom filter must never do."""
    for side, name in ((a, "left"), (b, "right")):
        params = [tuple(r) for r in
                  side.select("bloom_m", "bloom_k").distinct().collect()]
        if len(params) > 1:
            raise ValueError(
                f"bloom_merge: {name} side mixes {len(params)} (m, k) "
                f"parameterizations {sorted(params)}")
        if params and params[0] != (m, k):
            raise ValueError(
                f"bloom_merge: {name} side was built with "
                f"(m={params[0][0]}, k={params[0][1]}), merge called "
                f"with ({m}, {k})")
    return (a.unionByName(b).distinct())


def bloom_might_contain(bits: DataFrame, keys: DataFrame, key_col: str,
                        m: int, k: int) -> DataFrame:
    """``might_contain`` per distinct non-NULL key in ``keys``: true
    iff ALL k of the key's positions are set. The bit table is
    m-bounded so it broadcasts; the key side streams — probing any
    number of candidates is one narrow broadcast join plus a count.
    (m, k) must match the build; the table's own parameter columns
    are validated like :func:`countmin_estimate` (a mismatch would
    silently probe the wrong positions and report false negatives —
    the one thing a Bloom filter must never do)."""
    params = [tuple(r) for r in
              bits.select("bloom_m", "bloom_k").distinct().collect()]
    if len(params) > 1:
        raise ValueError(
            f"bit table mixes {len(params)} (m, k) parameterizations "
            f"{sorted(params)}")
    if params and params[0] != (m, k):
        raise ValueError(
            f"filter was built with (m={params[0][0]}, "
            f"k={params[0][1]}), probed with ({m}, {k})")
    pos = _bloom_positions(key_col, m, k)
    # distinct BEFORE banding: a key probed twice with k-1 set
    # positions would otherwise accumulate 2(k-1) >= k hits and flip
    # to a false positive in the count check
    keys_d = (keys.filter(F.col(key_col).isNotNull())
              .select(key_col).distinct())
    banded = keys_d.select(F.col(key_col), F.explode(pos).alias("bit"))
    joined = banded.join(F.broadcast(bits.select("bit")), "bit",
                         "left_semi") \
        .groupBy(key_col).agg(F.count("*").alias("_hits"))
    return (keys_d.join(joined, key_col, "left")
            .select(F.col(key_col),
                    (F.coalesce(F.col("_hits"), F.lit(0)) >= k)
                    .alias("might_contain")))


def linear_count_occupied(df: DataFrame, key_col: str,
                          group_cols: "list[str] | None" = None,
                          m: int = 1024) -> DataFrame:
    """Linear-counting cardinality sketch (Whang et al. 1990 — the
    small-cardinality regime HyperLogLog implementations fall back
    to): hash every key into one of ``m`` buckets and count the
    OCCUPIED buckets ``z_occ`` per group. The distinct-count estimate
    is ``-m * ln(1 - z_occ/m)``; callers apply it driver-side
    (:func:`linear_count_estimate`) — the gated/deterministic part is
    the integer ``z_occ`` itself (md5 buckets + distinct, bit-identical
    on any engine; ``ln`` is the one float step and stays OUT of the
    cross-engine contract).

    Scale shape: one distinct over (group, bucket) — at most m rows
    per group survive the map-side partial — then a count per group;
    the state is m-bounded however many distinct keys exist. NULL keys
    are excluded (no md5 bucket)."""
    if m < 1:
        raise ValueError("m must be >= 1")
    gcols = list(group_cols or [])
    b = (F.conv(F.substring(
        F.md5(F.concat(F.lit("lc_"), F.col(key_col).cast("string"))),
        1, 8), 16, 10).cast("long") % m)
    return (df.filter(F.col(key_col).isNotNull())
            .select(*gcols, b.alias("_b"))
            .distinct()
            .groupBy(*gcols)
            .agg(F.count("*").cast("long").alias("lc_occ"))
            .withColumn("lc_m", F.lit(int(m))))


def linear_count_estimate(z_occ: int, m: int) -> float:
    """The driver-side estimate for an occupied-bucket count: the
    classic -m * ln(1 - z/m); z == m (saturated) returns infinity —
    resize m, the sketch is out of its regime."""
    import math

    if z_occ >= m:
        return float("inf")
    return -m * math.log(1.0 - z_occ / m)


def kmins_minima(df: DataFrame, key_col: str,
                 group_cols: "list[str] | None" = None,
                 k: int = 16) -> DataFrame:
    """k-mins MinHash signature per group (Cohen 1997; Broder 1997):
    component ``j`` holds the MIN over the group's non-NULL keys of a
    60-bit md5-derived hash salted with ``j`` — returns
    ``(*group_cols, j, min_hv, kmins_k)``, exactly k rows per group
    however many distinct keys exist.

    Why k-mins and not bottom-k (the k smallest of ONE hash): bottom-k
    per group is a top-k maintenance problem — NOT a map-side
    combinable aggregate in Spark without buffering — while k-mins is
    ONE aggregation of k independent MINs: per-partition partials
    collapse to k longs per group before any shuffle, and signatures
    from disjoint corpora merge by elementwise LEAST
    (:func:`kmins_merge`). That is the sketch property that matters at
    100 TB: per-source/day signatures computed once, merged and
    compared without touching the raw keys again.

    What the signature buys beyond the cardinality sketches above:
    the agreement fraction of two groups' signatures estimates the
    JACCARD SIMILARITY of their key sets (:func:`kmins_agreement` —
    component j agrees iff both sets' j-th min is achieved by a
    shared key, which happens with probability |A∩B|/|A∪B|), so
    cross-corpus overlap matrices (user overlap between event types,
    vocabulary overlap between sources) come from k·G rows of state.
    Distinct counts fall out driver-side (:func:`kmins_estimate`).

    Determinism contract: integer md5-derived minima — bit-identical
    on any engine, partitioning or merge order; an SQL oracle rebuilds
    the exact signature. The k-fold row explosion happens on a narrow
    ``(group, j, hash)`` projection and collapses in the partial
    aggregate, never on wide rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    gcols = list(group_cols or [])
    comps = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (F.conv(F.substring(
                     F.md5(F.concat(F.lit(f"kmins{j}_"),
                                    F.col(key_col).cast("string"))),
                     1, 15), 16, 10).cast("long")).alias("hv"))
        for j in range(k)])
    salted = (df.filter(F.col(key_col).isNotNull())
              .select(*gcols, F.explode(comps).alias("c")))
    return (salted.groupBy(*gcols, F.col("c.j").alias("j"))
            .agg(F.min("c.hv").alias("min_hv"))
            .withColumn("kmins_k", F.lit(int(k))))


def _kmins_check_k(minima: DataFrame, k: int, what: str) -> None:
    """Validate a minima table carries exactly ONE k parameterization
    matching the caller's — the bounded-distinct contract shared with
    :func:`countmin_estimate` / :func:`bloom_might_contain` (mixing k
    would silently compare component j of different sketch families)."""
    params = [r[0] for r in
              minima.select("kmins_k").distinct().collect()]
    if len(params) > 1:
        raise ValueError(
            f"{what}: minima mix {len(params)} k parameterizations "
            f"{sorted(params)}")
    if params and params[0] != k:
        raise ValueError(
            f"{what}: signature was built with k={params[0]}, "
            f"called with k={k}")


def kmins_merge(a: DataFrame, b: DataFrame, group_cols: "list[str]",
                k: int) -> DataFrame:
    """Merge two signature tables: elementwise LEAST per (group, j) —
    the merged signature is EXACTLY the signature of the union of the
    two key sets (min distributes over union), the property that lets
    per-shard signatures roll up without re-reading keys. Groups
    present on one side only pass through unchanged."""
    _kmins_check_k(a, k, "kmins_merge")
    _kmins_check_k(b, k, "kmins_merge")
    return (a.unionByName(b)
            .groupBy(*group_cols, "j")
            .agg(F.min("min_hv").alias("min_hv"))
            .withColumn("kmins_k", F.lit(int(k))))


def kmins_agreement(minima: DataFrame, group_col: str,
                    k: int) -> DataFrame:
    """Pairwise signature agreement between every pair of groups:
    ``(ga, gb, agree)`` for ga < gb, where ``agree`` counts components
    whose minima coincide — ``agree / k`` is the classic MinHash
    estimate of Jaccard(A, B). The minima table is k·G-bounded, so the
    self-join broadcasts; the integer count keeps the float ratio out
    of the cross-engine contract."""
    _kmins_check_k(minima, k, "kmins_agreement")
    a = minima.select(F.col(group_col).alias("ga"), "j",
                      F.col("min_hv").alias("ha"))
    b = minima.select(F.col(group_col).alias("gb"), "j",
                      F.col("min_hv").alias("hb"))
    return (a.join(F.broadcast(b), "j")
            .filter(F.col("ga") < F.col("gb"))
            .groupBy("ga", "gb")
            .agg(F.sum((F.col("ha") == F.col("hb")).cast("long"))
                 .alias("agree"))
            .orderBy("ga", "gb"))


def kmins_estimate(minima_rows: "list[int]", k: int) -> float:
    """Driver-side distinct-count estimate from a group's k minima:
    each min_j is distributed like M / (n + 1) over the 60-bit space
    M = 2**60, so n̂ = k·M / Σ min_j − 1 (the k-mins estimator —
    averaging the per-component scale estimates). Float math stays out
    of the cross-engine contract like :func:`hll_estimate`; an empty
    key set (no minima) estimates 0."""
    if len(minima_rows) > k:
        raise ValueError(f"{len(minima_rows)} minima for k={k}")
    if not minima_rows:
        return 0.0
    M = float(1 << 60)
    if sum(minima_rows) == 0:
        # every component's minimum is literally 0 — beyond the
        # estimator's regime (n̂ -> infinity), not a ZeroDivisionError
        return float("inf")
    return k * M / sum(minima_rows) - 1.0


#: bin-count ceiling for histogram_sketch: state per group is
#: nbins + 2 longs and the quantile cascade is an nbins-branch CASE —
#: both costs are the caller's to pay deliberately, not by accident of
#: a mis-set parameter (the MAX_SAMPLE_WEIGHT precedent).
MAX_HIST_BINS = 256


def histogram_sketch(df: DataFrame, value_col: str, lo: float,
                     hi: float, nbins: int,
                     group_cols: "list[str] | None" = None,
                     ) -> DataFrame:
    """Per-group equi-width histogram — the mergeable numeric-profiling
    sketch (value distributions, drift monitoring, approximate
    quantiles) completing the toolkit next to CMS/HLL/Bloom/k-mins.

    At 100 TB an exact quantile needs a per-group sort
    (:func:`~fstd2pandas_spark.operators.quantiles.group_quantiles_disc`);
    a histogram needs ONE map-side-combinable aggregation into
    ``nbins + 2`` integer counters per group — fixed state at any
    corpus size — and histograms from different partitions, days or
    streams MERGE by plain vector addition
    (:func:`histogram_merge`), the same re-aggregation contract as the
    hypertable rollup.

    Determinism contract: bin assignment is
    ``least(floor((x - lo) / step), nbins - 1)`` on IEEE doubles —
    floor, subtraction and division are correctly rounded in every
    engine, and the clamp closes the one FP edge (an x just below
    ``hi`` whose scaled value rounds up to exactly ``nbins``) on both
    sides of the oracle identically. Counters are integer sums:
    order-free, partition-free, engine-free.

    Returns ``(*group_cols, n_under, n_over, hist)`` with ``hist`` an
    ``array<long>`` of ``nbins`` in-range counts; NULL values are
    excluded (a NULL has no bin — the CMS contract)."""
    if not nbins >= 1:
        raise ValueError("nbins must be >= 1")
    if nbins > MAX_HIST_BINS:
        raise ValueError(
            f"nbins={nbins} > MAX_HIST_BINS={MAX_HIST_BINS} — per-group "
            "state and the quantile CASE cascade are O(nbins); raise "
            "the ceiling deliberately if a finer profile is worth it")
    if not (lo < hi):
        raise ValueError("need lo < hi")
    step = (hi - lo) / nbins
    v = F.col(value_col).cast("double")
    b = F.least(F.floor((v - F.lit(float(lo))) / F.lit(float(step)))
                .cast("int"), F.lit(nbins - 1))
    in_range = v.isNotNull() & (v >= float(lo)) & (v < float(hi))
    bin_ = F.when(in_range, b)
    gcols = list(group_cols or [])
    agg = (df.groupBy(*gcols) if gcols else df.groupBy()).agg(
        F.sum(F.when(v.isNotNull() & (v < float(lo)), 1).otherwise(0))
        .cast("long").alias("n_under"),
        F.sum(F.when(v >= float(hi), 1).otherwise(0))
        .cast("long").alias("n_over"),
        *[F.sum(F.when(bin_ == i, 1).otherwise(0)).cast("long")
          .alias(f"_c{i}") for i in range(nbins)])
    return agg.select(*gcols, "n_under", "n_over",
                      F.array(*[F.col(f"_c{i}") for i in range(nbins)])
                      .alias("hist"))


def histogram_merge(sketches: DataFrame,
                    group_cols: "list[str]") -> DataFrame:
    """Re-aggregate sketches to a coarser grouping by vector addition —
    the mergeability that makes the histogram a sketch (per-day
    profiles roll into per-week ones without touching the facts).
    One posexplode + two chained integer aggregations — NO join, so a
    NULL group-key value merges like any other key (groupBy keeps NULL
    keys where an equi-join would silently drop them): the under/over
    flows ride on each sketch's ``_i == 0`` exploded row and are
    summed alongside that bin. The per-group collect_list is bounded
    at ``nbins`` elements by construction. A NULL ``hist`` raises
    in-plan: posexplode of a NULL array emits NO rows, so the group
    would otherwise VANISH from the merged output together with its
    under/overflow counts — a merge input must be a real sketch;
    outer-joined rosters (which :func:`histogram_quantile` supports)
    belong downstream of the merge."""
    nul = F.lit(
        "histogram_merge: NULL hist — a merge input must be a real "
        "sketch (the group would silently vanish from the merge); "
        "attach outer-joined rosters AFTER merging, where "
        "histogram_quantile handles their NULL sketches")
    checked = (F.when(F.col("hist").isNotNull(), F.col("hist"))
               .otherwise(F.raise_error(nul)
                          .cast(T.ArrayType(T.LongType()))))
    ex = sketches.select(*group_cols, "n_under", "n_over",
                         F.posexplode(checked).alias("_i", "_c"))
    # _k = how many input sketches contributed to this (group, bin):
    # sketches of DIFFERENT nbins merging into one group would leave
    # the tail bins fed by fewer inputs than bin 0 — a silently
    # half-merged histogram (every other sketch family validates its
    # parameterization; the hist LENGTH is this one's parameter)
    per_bin = (ex.groupBy(*group_cols, "_i")
               .agg(F.sum("_c").cast("long").alias("_c"),
                    F.count("*").alias("_k"),
                    F.sum(F.when(F.col("_i") == 0, F.col("n_under")))
                    .alias("_u"),
                    F.sum(F.when(F.col("_i") == 0, F.col("n_over")))
                    .alias("_o")))
    ragged = F.concat(
        F.lit("histogram_merge: a group mixes sketches of different "
              "bin counts (some bins fed by "),
        F.min("_k").cast("string"), F.lit(" inputs, others by "),
        F.max("_k").cast("string"),
        F.lit(") — merging histograms built with different nbins "
              "would silently sum mismatched bin widths"))
    merged_hist = F.transform(
        F.array_sort(F.collect_list(F.struct("_i", "_c"))),
        lambda s: s["_c"])
    return (per_bin.groupBy(*group_cols)
            .agg(F.max("_u").cast("long").alias("n_under"),
                 F.max("_o").cast("long").alias("n_over"),
                 F.when(F.min("_k") == F.max("_k"), merged_hist)
                 .otherwise(F.raise_error(ragged)
                            .cast(T.ArrayType(T.LongType())))
                 .alias("hist"))
            .select(*group_cols, "n_under", "n_over", "hist"))


def histogram_quantile(sketches: DataFrame, q: float, lo: float,
                       hi: float, nbins: int,
                       out_col: str = "hq") -> DataFrame:
    """Quantile ESTIMATE from the sketch alone: with ``n`` in-range
    rows and integer target rank ``t = ceil(q * n)``, find the first
    bin whose cumulative count reaches ``t`` and interpolate
    ``lo + step * (b + (t - cum_before) / c_b)`` — the classic
    histogram quantile, resolution ``step``. Every branch of the CASE
    cascade and the one division are identical IEEE double ops in the
    SQL mirror. NULL when the group has no in-range rows. ``lo``,
    ``hi``, ``nbins`` are the BUILD parameters — the caller's contract,
    checked in-plan against the array length."""
    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")
    if not nbins >= 1:
        raise ValueError("nbins must be >= 1")
    if not (lo < hi):
        raise ValueError("need lo < hi")
    step = (hi - lo) / nbins
    bad = F.concat(
        F.lit("histogram_quantile: sketch has "),
        F.size("hist").cast("string"),
        F.lit(f" bins but nbins={nbins} was claimed — the estimate "
              "would silently use the wrong bin width"))
    # a NULL hist row (e.g. sketches outer-joined to a group roster)
    # propagates a NULL estimate — only a PRESENT array of the wrong
    # length is a caller error worth dying for
    checked = (F.when(F.col("hist").isNull(),
                      F.lit(None).cast(T.ArrayType(T.LongType())))
               .when(F.size("hist") == nbins, F.col("hist"))
               .otherwise(F.raise_error(bad)
                          .cast(T.ArrayType(T.LongType()))))
    n = F.aggregate(checked, F.lit(0).cast("long"), lambda a, x: a + x)
    t = F.ceil(F.lit(float(q)) * n).cast("long")
    cums = []
    acc = F.lit(0).cast("long")
    for i in range(nbins):
        acc = acc + F.element_at("hist", i + 1)
        cums.append(acc)
    est = F.lit(None).cast("double")
    # build the cascade innermost-last so the FIRST bin reaching t wins
    for i in range(nbins - 1, -1, -1):
        before = cums[i - 1] if i > 0 else F.lit(0).cast("long")
        interp = (F.lit(float(lo))
                  + F.lit(float(step))
                  * (F.lit(float(i))
                     + (t - before).cast("double")
                     / F.element_at("hist", i + 1).cast("double")))
        est = F.when(t <= cums[i], interp).otherwise(est)
    return sketches.withColumn(out_col,
                               F.when(n > 0, est)
                               .otherwise(F.lit(None).cast("double")))
