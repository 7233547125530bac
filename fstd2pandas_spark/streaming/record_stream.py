"""Structured Streaming over the record table (SURVEY §2.10 extension).

The reference has no streaming (SURVEY §2.10) — its closest concept is the
time axis ``datev``/``forecast_hour`` organized per record. Here
forecast-cycle arrival maps onto Spark Structured Streaming natively:

- a file stream (``readStream``) over a directory of record-table
  parquet (or any ``fstrec``-converted drop zone): each forecast cycle
  lands as new files, Spark discovers them incrementally;
- event time = decoded ``datev`` (``date_of_validity``); watermarks bound
  state for late cycles;
- tumbling windows per forecast cycle for rollups;
- ``dropDuplicatesWithinWatermark`` for the streaming analog of the
  reference's ``drop_duplicates`` (dataframe.py:268-287);
- ``applyInPandasWithState`` for custom stateful operators (running
  per-variable extrema across cycles).

Scale: each micro-batch is a normal DataFrame — all batch operators in
this package apply unchanged. State is partitioned by group key across
executors; watermark retention bounds its size.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fstd2pandas_spark.functions.codecs import stamp_to_timestamp
from fstd2pandas_spark.schema import DEDUP_COLUMNS, RECORD_SCHEMA


def read_record_stream(spark: SparkSession, path: str,
                       schema: T.StructType | None = None,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Open a streaming record table over a parquet drop-zone directory.

    Adds ``event_time`` (decoded ``datev``) for watermarking. New files =
    new records; one forecast cycle per file drop is the expected layout.
    """
    reader = spark.readStream.schema(schema or RECORD_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    # .cast("timestamp"): watermarks require TimestampType, and
    # stamp_to_timestamp is NTZ since round 17 (the streaming plane is
    # the documented session-tz boundary — engine sessions pin UTC)
    return df.withColumn(
        "event_time",
        stamp_to_timestamp(F.col("datev")).cast("timestamp"))


def cycle_window_stats(stream: DataFrame, window_duration: str = "6 hours",
                       watermark: str = "1 hour") -> DataFrame:
    """Per (forecast-cycle window, nomvar) rollup: record count and the
    running mean of field means — the streaming version of ``fststat``
    (SURVEY §2.5 A1). Late records beyond ``watermark`` are dropped.
    An EMPTY ``d`` array has no mean: it contributes NULL (skipped by
    avg/min/max, still counted by n_records) — a divisor guard of 1
    would fabricate a 0.0 that drags min_mean to zero and deflates
    mean_of_means, a value the batch ``fststat`` never produces."""
    mean_d = F.when(
        F.size("d") > 0,
        F.aggregate("d", F.lit(0.0),
                    lambda a, x: a + x.cast("double")) / F.size("d"))
    return (
        stream.withWatermark("event_time", watermark)
        .withColumn("_mean", mean_d)
        .groupBy(F.window("event_time", window_duration), F.col("nomvar"))
        .agg(
            F.count("*").alias("n_records"),
            F.round(F.avg("_mean"), 6).alias("mean_of_means"),
            F.round(F.min("_mean"), 6).alias("min_mean"),
            F.round(F.max("_mean"), 6).alias("max_mean"),
        )
        .select(
            F.col("window.start").alias("cycle_start"),
            F.col("window.end").alias("cycle_end"),
            "nomvar", "n_records", "mean_of_means", "min_mean", "max_mean",
        )
    )


#: the reference's duplicate-detection key subset (dataframe.py:268-287,
#: ``ig2`` deliberately excluded) — reused for streaming dedup
DEDUP_KEYS = list(DEDUP_COLUMNS)


def streaming_interval_join(left: DataFrame, right: DataFrame,
                            on: str = "user_id",
                            left_time: str = "ts",
                            right_time: str = "ts",
                            max_delay: str = "1 hour",
                            left_watermark: str = "1 hour",
                            right_watermark: str = "1 hour",
                            right_prefix: str = "r_") -> DataFrame:
    """Watermarked stream-stream INNER join — the streaming
    enrichment/attribution staple ("join each view with the purchases
    that follow it within ``max_delay``"). Both inputs are unbounded
    streams; Spark buffers each side's rows in join state and emits a
    match the moment its partner arrives, in either order and across
    micro-batches.

    What bounds the state at 100 TB/day (the part a naive join
    misses): BOTH sides carry a watermark AND the join condition
    carries a closed time interval (``left_time <= right_time <=
    left_time + max_delay``), so Spark can prove when a buffered row
    can no longer match — left rows expire ``max_delay`` past the
    right watermark, right rows at the left watermark — and evicts
    them; without both, inner-join state grows forever. The global
    watermark is the MIN across sides (the default
    multipleWatermarkPolicy), so an idle side holds back eviction
    rather than dropping the active side's rows. Execution shuffles
    both streams on ``on`` once (the streaming twin of a sort-merge
    join); key skew is the same salting problem as the batch joins.

    Every ``right`` column is renamed with ``right_prefix`` first, so
    the result schema is unambiguous: all left columns plus
    ``{prefix}*`` right columns — enforced, not just promised: an
    empty prefix or a left column that already carries a prefixed
    right name fails loudly here instead of surfacing as an
    AMBIGUOUS_REFERENCE deep in analysis (the ``_salted_topk``
    reserved-name discipline). Inner semantics only — stream-stream
    outer joins additionally delay emission to the watermark; this
    engine's outer needs are served batch-side."""
    if not right_prefix:
        raise ValueError(
            "right_prefix must be non-empty — without it the join's "
            "two sides share every common column name and the result "
            "schema is ambiguous")
    clash = sorted(set(left.columns)
                   & {right_prefix + c for c in right.columns})
    if clash:
        raise ValueError(
            f"left stream already carries column(s) {clash} that "
            "collide with the prefixed right columns — the join "
            "condition and result schema would be ambiguous; pick a "
            "different right_prefix")
    # crisp fail-at-call on misspelled columns (the merge.py
    # convention): unresolved names would otherwise die deep in
    # analysis naming a renamed INTERNAL column
    lmiss = [c for c in (on, left_time) if c not in left.columns]
    if lmiss:
        raise ValueError(
            f"streaming_interval_join: columns {lmiss} not in the "
            f"left stream schema {sorted(left.columns)}")
    rmiss = [c for c in (on, right_time) if c not in right.columns]
    if rmiss:
        raise ValueError(
            f"streaming_interval_join: columns {rmiss} not in the "
            f"right stream schema {sorted(right.columns)}")
    # ONE Project for the whole rename (a withColumnRenamed loop
    # stacks N nested projections)
    r = right.select(*[F.col(c).alias(right_prefix + c)
                       for c in right.columns])
    lw = left.withWatermark(left_time, left_watermark)
    rw = r.withWatermark(right_prefix + right_time, right_watermark)
    rt = F.col(right_prefix + right_time)
    cond = (
        (F.col(on) == F.col(right_prefix + on))
        & (rt >= F.col(left_time))
        & (rt <= F.col(left_time) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner")


def streaming_drop_duplicates(stream: DataFrame,
                              keys: Iterable[str] = tuple(DEDUP_KEYS),
                              watermark: str = "1 hour") -> DataFrame:
    """Streaming analog of ``drop_duplicates`` (A2): duplicates arriving
    within the watermark horizon are suppressed; state self-expires."""
    return (
        stream.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


_EXTREMA_SCHEMA = T.StructType([
    # nomvar NULLABLE (round 16): a NULL variable name is a valid
    # GROUP (batch groupBy keeps it) — declared non-null, the state
    # function's NULL-key row failed row decoding and KILLED the whole
    # streaming query (EXPRESSION_DECODING_FAILED), found by the
    # random-events mirror harness
    T.StructField("nomvar", T.StringType(), True),
    T.StructField("n_seen", T.LongType(), False),
    T.StructField("running_min", T.DoubleType(), True),
    T.StructField("running_max", T.DoubleType(), True),
])

_EXTREMA_STATE = T.StructType([
    T.StructField("n_seen", T.LongType(), False),
    T.StructField("running_min", T.DoubleType(), True),
    T.StructField("running_max", T.DoubleType(), True),
])


def running_extrema(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-variable
    running min/max of field values across all micro-batches — state the
    windowless aggregations can't express with bounded memory per key.
    """

    def _update(key, pdfs, state: GroupState):
        n = 0
        lo = hi = None
        if state.exists:
            n, lo, hi = state.get
        for pdf in pdfs:
            for arr in pdf["d"]:
                if arr is None or len(arr) == 0:
                    continue
                vals = pd.Series(arr, dtype="float64")
                n += len(vals)
                # NaN/None elements count toward n_seen (the batch
                # count(*) contract) but must NOT poison the extrema:
                # pd.Series.min() over an all-NaN array returns NaN,
                # and min(lo, NaN) keeps NaN when it arrives FIRST —
                # making the answer depend on micro-batch arrival
                # order, permanently (Spark's batch min/max skip NULLs)
                clean = vals.dropna()
                if clean.empty:
                    continue
                m, mx = float(clean.min()), float(clean.max())
                lo = m if lo is None else min(lo, m)
                hi = mx if hi is None else max(hi, mx)
        state.update((n, lo, hi))
        yield pd.DataFrame({
            "nomvar": [key[0]], "n_seen": [n],
            "running_min": [lo], "running_max": [hi],
        })

    return (
        stream.select("nomvar", "d")
        .groupBy("nomvar")
        .applyInPandasWithState(
            _update,
            outputStructType=_EXTREMA_SCHEMA,
            stateStructType=_EXTREMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_result: DataFrame, table_name: str,
                  output_mode: str = "append") -> None:
    """Drain a streaming query into an in-memory sink with the
    ``availableNow`` trigger (process-everything-then-stop) and block
    until done — the test/CI drive pattern."""
    q = (
        stream_result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_document_stream(spark: SparkSession, path: str,
                         schema: "T.StructType | str" = (
                             "doc_id long, text string, lang string, "
                             "source string, n_chars long"),
                         max_files_per_trigger: "int | None" = None
                         ) -> DataFrame:
    """Open a streaming documents table over a parquet drop-zone — the
    ingestion front of a training-data pipeline: new crawl shards land
    as files, and every narrow-map operator in ``operators/llm``
    (language_id, quality_score, repetition_metrics, pii_counts/
    redact_pii, token_counts, fingerprint, hash_split,
    stratified_hash_sample, chunk_documents) applies to the stream
    UNCHANGED — they are pure projections, legal in streaming plans.
    Corpus-level operators (MinHash/LSH joins, boilerplate stats,
    connected components) need cross-document state and stay batch:
    run them on the accumulated sink, not the stream.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          watermark: str = "1 hour",
                          normalized: bool = False,
                          event_time_col: str = "event_time") -> DataFrame:
    """Streaming analog of ``exact_dedup`` — the dedup gate the ingest
    front needs: the FIRST arrival of each content hash passes, every
    re-arrival within the watermark horizon (re-crawled pages, replayed
    shards, at-least-once delivery) is suppressed, and the per-hash
    state self-expires with the watermark so it never grows beyond one
    horizon of distinct content.

    ``normalized=True`` keys on :func:`normalized_text_col` (case/
    punctuation/whitespace-insensitive), matching the batch operator's
    normalized ledger — INCLUDING its degenerate-form rule: a document
    whose normalized form is EMPTY (punctuation/emoji-only text) falls
    back to its RAW text as the key, because every such document would
    otherwise share md5('') and this destructive filter would silently
    mass-delete all but one unrelated degenerate document per horizon
    (the batch ledger excludes them for the same reason,
    dedup.py normalized_exact_dedup). A NULL text hashes to NULL and
    NULL keys compare equal in ``dropDuplicatesWithinWatermark``, so
    the stream keeps one NULL-text document per horizon — stated here
    because the batch operator has the same one-NULL-group contract.

    If the stream has no ``event_time_col``, a processing-time column
    is added (``current_timestamp()``): content dedup has no intrinsic
    event time, arrival IS the meaningful clock.  State is partitioned
    by the hash across executors — at 100 TB/day this scales with
    executor count exactly like the batch hash-groupBy."""
    from fstd2pandas_spark.operators.llm.dedup import normalized_text_col

    if "content_hash" in stream.columns:
        # the interval join's enforced reserved-name discipline:
        # withColumn would silently OVERWRITE the caller's column
        raise ValueError(
            "streaming_exact_dedup: the stream already carries a "
            "'content_hash' column, which this operator would "
            "silently overwrite — rename it first")
    if normalized:
        norm = normalized_text_col(F.col(text_col))
        key = F.when(F.length(norm) > 0, norm).otherwise(
            F.col(text_col))
    else:
        key = F.col(text_col)
    out = stream.withColumn("content_hash", F.md5(key))
    if event_time_col not in out.columns:
        out = out.withColumn(event_time_col, F.current_timestamp())
    return (
        out.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_signature_dedup(stream: DataFrame, text_col: str = "text",
                              watermark: str = "1 hour",
                              num_hashes: int = 8, shingle_k: int = 3,
                              event_time_col: str = "event_time"
                              ) -> DataFrame:
    """Near-exact streaming dedup one notch stronger than
    :func:`streaming_exact_dedup`: the key is the document's full
    MinHash signature (operators/llm/dedup.py minhash_signature — a
    narrow map, so it runs on the stream unchanged), which collapses
    reformattings that exact content hashing misses (word-preserving
    edits keep the shingle set, and identical shingle sets give
    identical signatures; near-identical sets still collide with
    probability ~ jaccard^num_hashes).

    Precision is tunable: higher ``num_hashes`` -> fewer false
    collisions (a false collision DROPS a document, so the default
    leans conservative).  This is deliberately NOT streaming LSH
    banding: band-level dropDuplicates would OR across bands and drop
    everything sharing ANY band — a recall tool for candidate
    GENERATION, far too aggressive for a destructive filter.  State:
    one signature per horizon, partitioned by the signature hash.

    DEGENERATE documents (fewer than ``shingle_k`` tokens, so the
    shingle set is empty) fall back to EXACT content hashing: their
    MinHash signature is the all-sentinel vector — one shared value
    for 'hi', 'bye' and every other short document — and keying this
    destructive filter on it would silently mass-delete all but one
    short document per horizon. The sentinel is detectable exactly
    (real minimum hashes live in [0, P); only an empty shingle set
    coalesces to P itself). NULL text stays the one-NULL-group
    contract of :func:`streaming_exact_dedup`."""
    from fstd2pandas_spark.operators.llm.dedup import (MINHASH_P,
                                                       minhash_signature)

    clash = sorted({"sig", "signature_hash"} & set(stream.columns))
    if clash:
        raise ValueError(
            f"streaming_signature_dedup: the stream already carries "
            f"{clash}, which this operator would silently "
            "overwrite/drop — rename them first")
    out = minhash_signature(stream, text_col, num_hashes, shingle_k)
    out = out.withColumn(
        "signature_hash",
        F.when(F.element_at(F.col("sig"), 1) != F.lit(MINHASH_P),
               F.md5(F.array_join(
                   F.transform(F.col("sig"),
                               lambda x: x.cast("string")), "|")))
        .otherwise(F.md5(F.col(text_col))))
    if event_time_col not in out.columns:
        out = out.withColumn(event_time_col, F.current_timestamp())
    return (
        out.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["signature_hash"])
        .drop("sig")
    )


_FUNNEL_OUT_SCHEMA = T.StructType([
    # user NULLABLE (round 16): a NULL user id is a valid GROUP (batch
    # groupBy keeps it) — declared non-null, the NULL-key group's
    # output row failed row decoding and KILLED the whole streaming
    # query, the same class as the extrema schema above; found by the
    # random-events mirror harness
    T.StructField("user", T.LongType(), True),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("first_step_us", T.LongType(), True),
    T.StructField("last_step_us", T.LongType(), True),
])

_FUNNEL_STATE_SCHEMA = T.StructType([
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("first_us", T.LongType(), True),
    T.StructField("last_us", T.LongType(), True),
    T.StructField("last_eid", T.LongType(), True),
])


def streaming_funnel(stream: DataFrame, steps: "list[str]",
                     ts_col: str = "ts", user_col: str = "user_id",
                     type_col: str = "event_type",
                     id_col: str = "event_id",
                     within: "int | None" = None) -> DataFrame:
    """Streaming analog of ``operators.funnel.funnel_steps``: per-user
    funnel progress maintained as keyed state (``applyInPandasWithState``),
    one updated (user, depth, first/last step time) row per user per
    micro-batch touching that user.

    ``within`` (seconds) mirrors the batch operator's optional horizon:
    steps 2..k only count within that window of the accepted step-1
    event. State is four scalars per user — depth, first/last accepted
    step time, tie-break event id — partitioned by user across executors;
    it does NOT buffer events.  The price of that bound is an ordering
    contract: within a micro-batch events are sorted by (ts, event_id)
    before folding (exact), but an event arriving in a LATER micro-batch
    with a timestamp before the last accepted step cannot retroactively
    advance the funnel — the stream is exact when each user's events
    arrive non-decreasing across micro-batches (per-shard log shipping),
    an approximation under arbitrary replay.  The batch operator over
    the accumulated sink remains the ground truth, the same honest
    split documented for the corpus-level document operators."""
    k = len(steps)
    if k == 0:
        raise ValueError("streaming_funnel: need at least one step")
    within_us = None if within is None else int(within) * 1_000_000

    # NULL event_id tie-break sentinel: Spark sorts NULLs FIRST in an
    # ascending struct sort (the batch fold's ordering), and int(pd.NA)
    # would RAISE inside the state function, killing the whole query
    # on one bad row
    _eid_null = -(2 ** 63) + 1

    def _update(key, pdfs, state: GroupState):
        depth, first_us, last_us, last_eid = (
            state.get if state.exists else (0, None, -1, -1))
        ev = pd.concat(list(pdfs), ignore_index=True)
        # a NULL clock cannot be ordered: the batch fold SKIPS such
        # events (unix_micros(NULL) nulls the accept condition) — and
        # pandas converts NaT to int64-MIN instead of raising, which
        # would otherwise accept a garbage timestamp as step 1 and
        # permanently wedge the within-horizon at ~-9.2e15
        ev = ev.dropna(subset=[ts_col])
        # applyInPandasWithState currently delivers session-naive
        # timestamps, but pandas 2.x raises on .astype('datetime64[ns]')
        # for a tz-aware column — normalize defensively so the operator
        # survives Arrow/pandas timestamp-configuration changes
        ts = pd.to_datetime(ev[ts_col])
        if getattr(ts.dt, "tz", None) is not None:
            ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
        ev = ev.assign(
            _us=ts.astype("datetime64[ns]").astype("int64") // 1000,
            _eid=ev[id_col].map(
                lambda x: _eid_null if pd.isna(x) else int(x)),
        ).sort_values(["_us", "_eid"])
        for us, eid, et in zip(ev["_us"], ev["_eid"], ev[type_col]):
            us, eid = int(us), int(eid)
            if depth >= k or et != steps[depth]:
                continue
            if depth > 0 and (us, eid) <= (last_us, last_eid):
                continue
            # within-horizon: steps 2..k only count inside the window
            # anchored at the step-1 event — the batch fold's bound
            if (within_us is not None and depth > 0
                    and us > first_us + within_us):
                continue
            depth += 1
            if first_us is None:
                first_us = us
            last_us, last_eid = us, eid
        state.update((depth, first_us, last_us, last_eid))
        yield pd.DataFrame({
            "user": [key[0]], "depth": [depth],
            "first_step_us": pd.array([first_us], dtype="Int64"),
            "last_step_us": pd.array(
                [last_us if depth > 0 else None], dtype="Int64"),
        })

    return (
        stream.select(user_col, ts_col, id_col, type_col)
        # NULL-identity exclusion (round 16, the batch funnel_steps /
        # sessionize contract): a NULL user key pools unrelated
        # unidentified events into one pseudo-user's funnel state
        .filter(F.col(user_col).isNotNull())
        .groupBy(user_col)
        .applyInPandasWithState(
            _update, _FUNNEL_OUT_SCHEMA, _FUNNEL_STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout)
    )
