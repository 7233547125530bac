"""Structured Streaming tests (SURVEY §2.10 extension): drive with
availableNow triggers over a parquet drop-zone and compare against the
batch equivalents."""

import uuid

import pytest
from pyspark.sql import functions as F

from fstd2pandas_spark.streaming import (
    cycle_window_stats,
    read_record_stream,
    run_to_memory,
    running_extrema,
    streaming_drop_duplicates,
)


@pytest.fixture(scope="module")
def drop_zone(spark, records, tmp_path_factory):
    """Record-table parquet written as two file drops (= two forecast
    cycles arriving)."""
    zone = str(tmp_path_factory.mktemp("dropzone"))
    recs = records.select(
        "nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo", "ip1",
        "ip2", "ip3", "deet", "npas", "datyp", "nbits", "grtyp", "ig1",
        "ig2", "ig3", "ig4", "datev", "grid", "d", "path", "key",
    ).withColumn("dateo", F.col("dateo").cast("long")) \
     .withColumn("datev", F.col("datev").cast("long"))
    for i, half in enumerate(recs.randomSplit([0.5, 0.5], seed=7)):
        half.coalesce(1).write.parquet(f"{zone}/drop{i}")
    # stream source watches a flat dir of parquet files
    import glob
    import shutil

    flat = str(tmp_path_factory.mktemp("flat"))
    for j, f in enumerate(sorted(glob.glob(f"{zone}/drop*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/cycle-{j}.parquet")
    return flat


def _mem_table(spark, name):
    return spark.sql(f"SELECT * FROM {name}")


def test_cycle_window_stats_matches_batch(spark, records, drop_zone):
    name = f"cyc_{uuid.uuid4().hex[:8]}"
    stream = read_record_stream(spark, drop_zone, max_files_per_trigger=1)
    # append mode would hold back windows the watermark never passes
    # (availableNow ends the query first); complete re-emits all windows.
    run_to_memory(cycle_window_stats(stream), name, output_mode="complete")
    got = _mem_table(spark, name).toPandas()

    # batch equivalent over the same files
    from fstd2pandas_spark.functions.codecs import stamp_to_timestamp

    batch = spark.read.parquet(drop_zone).withColumn(
        "event_time", stamp_to_timestamp(F.col("datev")))
    # mirror the operator's empty-array rule: no mean, not a fake 0.0
    mean_d = F.when(
        F.size("d") > 0,
        F.aggregate("d", F.lit(0.0),
                    lambda a, x: a + x.cast("double")) / F.size("d"))
    want = (
        batch.withColumn("_mean", mean_d)
        .groupBy(F.window("event_time", "6 hours"), "nomvar")
        .agg(F.count("*").alias("n_records"),
             F.round(F.avg("_mean"), 6).alias("mean_of_means"))
        .select("nomvar", "n_records", "mean_of_means")
    ).toPandas()
    key = ["nomvar", "n_records", "mean_of_means"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    want_s = want[key].sort_values(key).reset_index(drop=True)
    assert got_s.equals(want_s)
    assert (got["cycle_end"] - got["cycle_start"]).nunique() == 1


def test_streaming_dedup_suppresses_replayed_cycle(spark, records,
                                                   drop_zone, tmp_path):
    """Replaying the same cycle file (at-least-once delivery) must not
    duplicate records downstream."""
    import glob
    import shutil

    zone = str(tmp_path / "dups")
    (tmp_path / "dups").mkdir()
    files = sorted(glob.glob(f"{drop_zone}/*.parquet"))
    for f in files:
        shutil.copy(f, zone)
    shutil.copy(files[0], f"{zone}/replayed.parquet")

    name = f"dd_{uuid.uuid4().hex[:8]}"
    stream = read_record_stream(spark, zone)
    run_to_memory(streaming_drop_duplicates(stream), name)
    got = _mem_table(spark, name).count()
    # the fixture plants one duplicate pair of its own — batch-dedup is
    # the ground truth, and the replayed file must add nothing beyond it
    from fstd2pandas_spark.streaming import DEDUP_KEYS

    want = spark.read.parquet(drop_zone).dropDuplicates(DEDUP_KEYS).count()
    assert got == want


def test_running_extrema_state(spark, records, drop_zone):
    name = f"ext_{uuid.uuid4().hex[:8]}"
    stream = read_record_stream(spark, drop_zone, max_files_per_trigger=1)
    run_to_memory(running_extrema(stream), name, output_mode="update")
    got = _mem_table(spark, name).toPandas()

    batch = spark.read.parquet(drop_zone).select("nomvar", "d")
    want = (
        batch.select("nomvar", F.explode("d").alias("v"))
        .groupBy("nomvar")
        .agg(F.count("*").alias("n_seen"),
             F.min(F.col("v").cast("double")).alias("running_min"),
             F.max(F.col("v").cast("double")).alias("running_max"))
    ).toPandas().set_index("nomvar")

    # the final update per nomvar must equal the batch totals
    final = got.sort_values("n_seen").groupby("nomvar").last()
    for nomvar, row in want.iterrows():
        assert final.loc[nomvar, "n_seen"] == row["n_seen"]
        assert abs(final.loc[nomvar, "running_min"] - row["running_min"]) < 1e-5
        assert abs(final.loc[nomvar, "running_max"] - row["running_max"]) < 1e-5


def test_fstrec_stream_incremental(spark, records, tmp_path):
    """fstrec streaming source: files are consumed exactly once across
    restarts (checkpointed offsets track the seen-file set)."""
    from fstd2pandas_spark.sources import register

    register(spark)
    zone = str(tmp_path / "zone")
    ckpt = str(tmp_path / "ckpt")
    half1, half2 = records.randomSplit([0.5, 0.5], seed=11)
    half1.coalesce(1).write.format("fstrec").mode("append").save(zone)

    out = str(tmp_path / "out")

    def drain():
        # memory sink cannot resume from a checkpoint; a file sink can
        q = (
            spark.readStream.format("fstrec").load(zone)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    n1 = drain()
    assert n1 == half1.count()
    # second cycle lands; restart consumes ONLY the new file
    import glob
    import shutil

    tmp2 = str(tmp_path / "tmp2")
    half2.coalesce(1).write.format("fstrec").mode("append").save(tmp2)
    for f in glob.glob(f"{tmp2}/*.fstrec"):
        shutil.copy(f, zone + "/cycle2.fstrec")
    n2 = drain()
    assert n2 == records.count()


def test_llm_narrow_maps_compose_with_streaming(spark, tmp_path):
    """The per-document pipeline layer runs unchanged on a document
    stream: drop two parquet shards, run language-ID + quality + PII +
    split + chunk-count over readStream, and the drained sink equals
    the same operators applied in batch."""
    from fstd2pandas_spark.operators.llm import (
        language_id, quality_score)
    from fstd2pandas_spark.operators.llm.sampling import hash_split
    from fstd2pandas_spark.operators.llm.scrub import pii_counts
    from fstd2pandas_spark.streaming.record_stream import (
        read_document_stream, run_to_memory)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    zone = str(tmp_path / "doczone")
    for i, half in enumerate(docs.randomSplit([0.5, 0.5], seed=3)):
        half.coalesce(1).write.mode("append").parquet(zone)

    def pipe(df):
        return hash_split(pii_counts(quality_score(language_id(df)))).select(
            "doc_id", "lang_pred", "quality", "n_email", "split")

    run_to_memory(pipe(read_document_stream(spark, zone)),
                  "doc_stream_pipe")
    got = spark.sql("SELECT * FROM doc_stream_pipe")
    want = pipe(spark.read.parquet(zone))
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) == docs.count()


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup over a drop-zone with DUPLICATE shards:
    the drained sink holds exactly one row per content hash — the same
    ledger the batch exact_dedup computes over the accumulated input —
    no matter how many times a shard is replayed."""
    from fstd2pandas_spark.operators.llm.dedup import exact_dedup
    from fstd2pandas_spark.streaming.record_stream import (
        read_document_stream, run_to_memory, streaming_exact_dedup)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(60))
    zone = str(tmp_path / "dupzone")
    docs.coalesce(1).write.mode("append").parquet(zone)
    # replay: the same shard content lands twice more (at-least-once
    # delivery / re-crawl), plus a half-shard of repeats
    docs.coalesce(1).write.mode("append").parquet(zone)
    docs.limit(25).coalesce(1).write.mode("append").parquet(zone)

    stream = read_document_stream(spark, zone, max_files_per_trigger=1)
    run_to_memory(streaming_exact_dedup(stream), "doc_stream_dedup")
    got = spark.sql("SELECT content_hash, text FROM doc_stream_dedup")

    batch = exact_dedup(spark.read.parquet(zone))
    # one survivor per content hash (the input corpus may itself hold
    # duplicate texts — batch exact_dedup is the ground truth)
    assert got.count() == batch.count()
    g_hashes = {r["content_hash"] for r in got.collect()}
    b_hashes = {r["content_hash"] for r in batch.collect()}
    assert g_hashes == b_hashes
    # the survivor carries real payload: its text re-hashes to its key
    assert got.filter(F.md5("text") != F.col("content_hash")).count() == 0


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Session windows on a watermarked event stream: after draining
    with availableNow (complete mode — every session closed), the sink
    equals the batch sessionize of the same events."""
    import datetime as dt

    from fstd2pandas_spark.operators.sessions import sessionize
    from fstd2pandas_spark.streaming.record_stream import run_to_memory

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for u in range(5):
        t = base + dt.timedelta(minutes=u)
        for i in range(20):
            # alternating small steps and > gap jumps => several sessions
            t += dt.timedelta(minutes=(40 if i % 7 == 3 else 5))
            rows.append((u * 100 + i, t, u, "e", float(i), ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    zone = str(tmp_path / "events_zone")
    df.coalesce(2).write.parquet(zone)

    stream = (spark.readStream.schema(df.schema).parquet(zone)
              .withWatermark("ts", "1 minute"))
    run_to_memory(sessionize(stream, gap="30 minutes"),
                  "sess_sink", output_mode="complete")
    got = {tuple(r) for r in spark.table("sess_sink").collect()}
    want = {tuple(r) for r in sessionize(df, gap="30 minutes").collect()}
    assert got == want and len(want) > 5


def test_streaming_signature_dedup(spark, tmp_path):
    """Signature-keyed streaming dedup: a reformatted copy (same words,
    different case/punctuation-free spacing preserved at the shingle
    level) is suppressed while genuinely different docs pass."""
    from fstd2pandas_spark.operators.llm.dedup import minhash_signature
    from fstd2pandas_spark.streaming.record_stream import (
        run_to_memory, streaming_signature_dedup)

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, base),
        (2, base),                      # exact duplicate -> suppressed
        (3, "a totally different document with its own words here"),
        (4, base.upper()),              # lowercased tokens -> same sig
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    zone = str(tmp_path / "sig_zone")
    df.coalesce(1).write.parquet(zone)

    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(zone)
    run_to_memory(streaming_signature_dedup(stream), "sig_dedup_sink")
    kept = {r.doc_id for r in spark.table("sig_dedup_sink").collect()}
    # one of {1,2,4} (same signature group) plus 3
    assert 3 in kept and len(kept) == 2
    # sanity: the signature really is case-insensitive-identical
    sigs = {r.doc_id: tuple(r.sig) for r in
            minhash_signature(df).select("doc_id", "sig").collect()}
    assert sigs[1] == sigs[2] == sigs[4] != sigs[3]


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Stateful streaming funnel over time-ordered shards: the final
    per-user state after draining equals the batch funnel_steps over
    the accumulated events (the exactness contract: per-user arrival
    non-decreasing across micro-batches)."""
    from fstd2pandas_spark.operators.funnel import funnel_steps
    from fstd2pandas_spark.streaming.record_stream import (
        run_to_memory, streaming_funnel)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # split at a global time boundary so each user's events arrive in
    # non-decreasing order across the two shards
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = ev.agg(F.expr(
        "percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")).first()[0]
    a = ev.filter(us <= cut)
    b = ev.filter(us > cut)
    zone = str(tmp_path / "evzone")
    a.coalesce(1).write.parquet(zone + "/part=00")
    b.coalesce(1).write.parquet(zone + "/part=01")

    steps = ["view", "click", "purchase"]
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(zone + "/part=*"))
    run_to_memory(streaming_funnel(stream, steps), "funnel_sink",
                  output_mode="update")
    # last update per user is the final state
    got = spark.sql("""
        SELECT user, depth, first_step_us, last_step_us FROM (
          SELECT *, row_number() OVER (PARTITION BY user ORDER BY rn DESC) r
          FROM (SELECT *, monotonically_increasing_id() AS rn
                FROM funnel_sink)) WHERE r = 1""")
    gm = {r.user: (r.depth, r.first_step_us, r.last_step_us)
          for r in got.collect()}
    bm = {r.user: (r.depth,
                   r.step_ts_us[0] if r.depth else None,
                   r.step_ts_us[-1] if r.depth else None)
          for r in funnel_steps(ev, steps).collect()}
    assert set(gm) == set(bm)
    assert gm == bm


def test_streaming_funnel_within_matches_batch(spark, tmp_path):
    """The round-8 within-horizon addition: drained streaming funnel
    with a horizon equals batch funnel_steps with the same horizon."""
    from pyspark.sql import functions as F
    from fstd2pandas_spark.operators.funnel import funnel_steps
    from fstd2pandas_spark.streaming.record_stream import (
        run_to_memory, streaming_funnel)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    zone = str(tmp_path / "evzone_w")
    ev.coalesce(1).write.parquet(zone + "/part=00")
    steps = ["view", "click", "purchase"]
    stream = (spark.readStream.schema(ev.schema).parquet(zone + "/part=*"))
    run_to_memory(streaming_funnel(stream, steps, within=86400),
                  "funnel_w_sink", output_mode="update")
    got = {r.user: (r.depth, r.first_step_us, r.last_step_us)
           for r in spark.table("funnel_w_sink").groupBy("user").agg(
               F.max(F.struct("depth", "last_step_us", "first_step_us"))
               .alias("m")).select(
               "user", "m.depth", "m.first_step_us",
               "m.last_step_us").collect()}
    bm = {r.user: (r.depth,
                   r.step_ts_us[0] if r.depth else None,
                   r.step_ts_us[-1] if r.depth else None)
          for r in funnel_steps(ev, steps, within=86400).collect()}
    assert got == bm
    depths = {d for d, _, _ in got.values()}
    assert len(depths) >= 2, "horizon should vary depths"


def test_watermark_late_drop_lags_one_batch(spark, tmp_path):
    """Pins the Structured Streaming semantic the stream_events_hourly
    kind='late' gate is built on: the LATE-EVENT filter uses the
    watermark committed at the END of the previous batch — one batch
    BEHIND the eviction watermark shown in query progress. So a replay
    arriving in the batch right after the watermark-establishing data
    is NOT yet dropped, while the same replay one batch later IS.
    Shape mirrors the gate: batch 0 = OLD+FRESH, batch 1 = FRESH,
    batch 2 = OLD+FRESH -> OLD hours stay at base count, the fresh
    hour reaches 3x."""
    import glob
    import os
    import shutil

    rows_old = [("a", "2024-01-01 00:10:00"), ("a", "2024-01-01 00:20:00"),
                ("b", "2024-01-01 01:40:00")]
    rows_fresh = [("a", "2024-01-05 04:15:00"), ("b", "2024-01-05 04:45:00")]

    def _df(rows):
        return spark.createDataFrame(rows, "k string, tss string").select(
            "k", F.col("tss").cast("timestamp").alias("ts"))

    zone = str(tmp_path / "latezone")
    os.makedirs(zone)
    batches = (_df(rows_old + rows_fresh), _df(rows_fresh),
               _df(rows_old + rows_fresh))
    for i, bdf in enumerate(batches):
        tmp = str(tmp_path / f"b{i}")
        bdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(zone, f"batch_{i}.parquet")
        shutil.copy(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    agg = (spark.readStream.schema("k string, ts timestamp")
           .option("maxFilesPerTrigger", "1").parquet(zone)
           .withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour"), "k")
           .agg(F.count("*").alias("n")))
    name = f"late_pin_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(q.recentProgress) == 3   # mtime order forced 3 batches
    final = {(str(r["h"]), r["k"]): r["n"] for r in
             spark.table(name)
             .groupBy(F.col("window.start").alias("h"), "k")
             .agg(F.max("n").alias("n")).collect()}
    assert final == {
        ("2024-01-01 00:00:00", "a"): 2,   # batch-2 replay DROPPED
        ("2024-01-01 01:00:00", "b"): 1,   # batch-2 replay DROPPED
        ("2024-01-05 04:00:00", "a"): 3,   # kept in batches 0/1/2
        ("2024-01-05 04:00:00", "b"): 3,
    }
    # the drop happened in batch 2, not batch 1 (the one-batch lag)
    dropped = [op["numRowsDroppedByWatermark"]
               for p in sorted(q.recentProgress, key=lambda p: p["batchId"])
               for op in p["stateOperators"]]
    assert dropped[0] == 0 and dropped[1] == 0 and dropped[2] >= 1


def test_streaming_interval_join_cross_batch(spark, tmp_path):
    """Stream-stream inner join buffers the left side in join state
    across micro-batches: views arrive in batch 0 (the right source
    contributes only an empty schema file), purchases in batch 1 —
    EVERY match is therefore cross-batch, proving the state machinery
    end-to-end; condition bounds match to [ts, ts + 1 hour]. Also pins
    the min-watermark policy protecting the construction: the right
    side's batch-0 silence keeps the global watermark at epoch 0, so
    batch-1 purchases (older than the left max) are NOT late-dropped."""
    import glob
    import os
    import shutil

    from fstd2pandas_spark.streaming import (
        run_to_memory, streaming_interval_join)

    def _df(rows):
        return spark.createDataFrame(rows, "user_id long, tss string") \
            .select("user_id", F.col("tss").cast("timestamp").alias("ts"))

    views = _df([(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"),
                 (2, "2024-01-01 10:30:00")])
    purch = _df([(1, "2024-01-01 10:30:00"),   # view1 + 30 min -> match
                 (1, "2024-01-01 13:30:00"),   # 1.5 h after view2 -> no
                 (2, "2024-01-01 10:15:00"),   # BEFORE the view -> no
                 (2, "2024-01-01 11:00:00"),   # view3 + 30 min -> match
                 (3, "2024-01-01 11:00:00")])  # no view at all
    empty = _df([])

    lzone, rzone = str(tmp_path / "vz"), str(tmp_path / "pz")
    os.makedirs(lzone); os.makedirs(rzone)
    for zone, fname, bdf, mt in ((lzone, "b0", views, 0),
                                 (rzone, "b0", empty, 0),
                                 (rzone, "b1", purch, 100)):
        tmp = str(tmp_path / f"w_{os.path.basename(zone)}_{fname}")
        bdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = glob.glob(os.path.join(tmp, "part-*.parquet"))
        assert parts, "empty write must still produce a schema file"
        dst = os.path.join(zone, f"{fname}.parquet")
        shutil.copy(parts[0], dst)
        os.utime(dst, (1_700_000_000 + mt,) * 2)

    schema = "user_id long, ts timestamp"
    left = (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(lzone))
    right = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", "1").parquet(rzone))
    joined = streaming_interval_join(left, right, on="user_id",
                                     max_delay="1 hour")
    name = f"sjoin_pin_{uuid.uuid4().hex[:8]}"
    run_to_memory(joined, name)

    got = {(r["user_id"], str(r["ts"]), str(r["r_ts"]))
           for r in spark.table(name).collect()}
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
        (2, "2024-01-01 10:30:00", "2024-01-01 11:00:00"),
    }

    # prefix-collision and empty-prefix guards fire at call time, not
    # as an AMBIGUOUS_REFERENCE deep in analysis
    lstat = spark.readStream.schema("user_id long, ts timestamp, r_ts timestamp").parquet(lzone)
    rstat = spark.readStream.schema(schema).parquet(rzone)
    with pytest.raises(ValueError, match="collide"):
        streaming_interval_join(lstat, rstat, on="user_id")
    with pytest.raises(ValueError, match="non-empty"):
        streaming_interval_join(
            spark.readStream.schema(schema).parquet(lzone), rstat,
            on="user_id", right_prefix="")


def test_apply_cdc_stream_multibatch_and_replay(spark, tmp_path):
    """The streaming CDC sink (streaming/cdc_sink.py): three CDC
    micro-batches (forced by per-file mtimes + maxFilesPerTrigger=1)
    sequentially maintain a serving table via merge_upsert under the
    generation commit protocol — insert, within-batch latest-wins
    update, tombstone, post-tombstone re-insert, NULL keys, exact
    duplicate rows — and a FULL at-least-once replay (fresh
    checkpoint, same drop zone, whole zone in one batch) converges to
    the identical table. GC bounds the committed generations at
    keep_generations; read_cdc_table is None before the first
    commit."""
    import glob
    import os
    import shutil

    from fstd2pandas_spark.streaming import (apply_cdc_stream,
                                             read_cdc_table)

    root = str(tmp_path / "serving")
    zone = str(tmp_path / "cdczone")
    os.makedirs(zone)
    assert read_cdc_table(spark, root) is None

    schema = "k long, s string, v long, ver long, del boolean"
    b0 = [(1, "a", 10, 1, False), (2, "b", 20, 1, False),
          (3, "c", 30, 1, False), (4, "d", 40, 1, False),
          (None, "n", 0, 1, False)]
    b1 = [(2, "b2", 21, 2, False), (2, "b3", 22, 3, False),
          (3, "x", 0, 3, True), (5, "e", 50, 3, False),
          (None, "n2", 1, 3, False)]
    b2 = [(5, "z", 0, 4, True), (3, "c2", 31, 5, False),
          (1, "a", 10, 1, False), (1, "a", 10, 1, False)]
    for i, rows in enumerate((b0, b1, b2)):
        stage = str(tmp_path / f"cdc_b{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        dst = os.path.join(zone, f"batch_{i}.parquet")
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                    dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    expected = {(1, "a", 10), (2, "b3", 22), (3, "c2", 31),
                (4, "d", 40), (None, "n2", 1)}

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(zone))
    q = apply_cdc_stream(stream, root, ["k"], version_col="ver",
                         delete_col="del",
                         checkpoint_dir=str(tmp_path / "cp1"))
    q.awaitTermination()
    assert len(q.recentProgress) >= 3   # one batch per file
    assert {tuple(r) for r in
            read_cdc_table(spark, root).collect()} == expected

    # GC: at most keep_generations committed generations survive
    gens = [d for d in os.listdir(root) if d.startswith("gen-")]
    assert 1 <= len(gens) <= 2, gens

    # at-least-once replay: fresh checkpoint, the whole zone
    # re-delivered (one batch) onto the already-final table — the
    # merge must converge to the identical state, and the new
    # generation must be the VISIBLE one (numbering survives the
    # checkpoint reset)
    head_before = sorted(gens)[-1]
    replay = spark.readStream.schema(schema).parquet(zone)
    q2 = apply_cdc_stream(replay, root, ["k"], version_col="ver",
                          delete_col="del",
                          checkpoint_dir=str(tmp_path / "cp2"))
    q2.awaitTermination()
    assert {tuple(r) for r in
            read_cdc_table(spark, root).collect()} == expected
    head_after = sorted(d for d in os.listdir(root)
                        if d.startswith("gen-"))[-1]
    assert head_after > head_before

    # time travel: both retained generations readable by number; the
    # replay generation's CONTENT equals the pre-replay head, so the
    # change feed between them is EMPTY — idempotent replay, certified
    # at the row level (the Delta CDF read, log-free)
    from fstd2pandas_spark.streaming import cdc_changes

    retained = sorted(int(d[len("gen-"):]) for d in os.listdir(root)
                      if d.startswith("gen-"))
    assert len(retained) == 2          # keep_generations default
    for g in retained:
        assert {tuple(r) for r in read_cdc_table(
            spark, root, generation=g).collect()} == expected
    assert cdc_changes(spark, root, ["k"],
                       retained[0], retained[1]).count() == 0
    assert cdc_changes(spark, root, ["k"], retained[0]).count() == 0
    # a GC'd generation is out of the retention window — loud
    with pytest.raises(ValueError, match="retained"):
        read_cdc_table(spark, root, generation=0)
    with pytest.raises(ValueError, match="retained"):
        cdc_changes(spark, root, ["k"], 0)
    # from_generation=None would silently diff head vs head — loud
    with pytest.raises(ValueError, match="head against itself"):
        cdc_changes(spark, root, ["k"], None)
    # bools slip through dict lookups via bool-int equality — loud on
    # every generation parameter, not just from_generation
    with pytest.raises(ValueError, match="generation number"):
        read_cdc_table(spark, root, generation=False)
    with pytest.raises(ValueError, match="generation number"):
        cdc_changes(spark, root, ["k"], retained[0],
                    to_generation=True)
    # an inverted range would move consumers BACKWARD (Delta's
    # start<=end rule)
    with pytest.raises(ValueError, match="BACKWARD"):
        cdc_changes(spark, root, ["k"], retained[1], retained[0])

    with pytest.raises(ValueError, match="keep_generations"):
        apply_cdc_stream(replay, root, ["k"], keep_generations=0)
    # misconfigurations must fail AT START, not asynchronously inside
    # the first micro-batch (a fire-and-forget continuous caller never
    # sees foreachBatch exceptions)
    with pytest.raises(ValueError, match="not in the CDC stream"):
        apply_cdc_stream(replay, root, ["K"], version_col="ver")
    with pytest.raises(ValueError, match="not in the CDC stream"):
        apply_cdc_stream(replay, root, ["k"], version_col="vrsn")
    with pytest.raises(ValueError, match="cannot also be key"):
        apply_cdc_stream(replay, root, ["k"], version_col="k")
    with pytest.raises(ValueError, match="needs a\\s+checkpoint"):
        apply_cdc_stream(replay, root, ["k"], available_now=False)

    # an EMPTY micro-batch is a no-op: it must not rewrite the table
    # into a fresh generation nor burn a retention slot
    empty_zone = str(tmp_path / "emptyzone")
    os.makedirs(empty_zone)
    spark.createDataFrame([], schema).coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "empty_stage"))
    shutil.copy(
        glob.glob(os.path.join(str(tmp_path / "empty_stage"),
                               "part-*.parquet"))[0],
        os.path.join(empty_zone, "b.parquet"))
    head_pre = sorted(d for d in os.listdir(root)
                      if d.startswith("gen-"))
    qe = apply_cdc_stream(
        spark.readStream.schema(schema).parquet(empty_zone), root,
        ["k"], version_col="ver", delete_col="del",
        checkpoint_dir=str(tmp_path / "cp_empty"))
    qe.awaitTermination()
    assert sorted(d for d in os.listdir(root)
                  if d.startswith("gen-")) == head_pre


def test_cdc_generation_paths_keep_scheme(spark, tmp_path):
    """The fsutil contract, pinned on the CDC sink (r12 What's-wrong
    #2): generation paths handed back to readers/GC must stay FULLY
    QUALIFIED — ``toUri().getPath()`` strips scheme+authority, and a
    stripped ``s3a://bucket/serving/gen-...`` silently resolves
    against the cluster's default filesystem (a different table at
    worst). Simulated with an explicit ``file:`` root: the committed
    generation listing and the read path must keep the scheme."""
    from fstd2pandas_spark.streaming.cdc_sink import (
        _committed_generations, read_cdc_table)

    local_root = tmp_path / "serving"
    gen = local_root / "gen-00000000000000000007"
    spark.createDataFrame([(1, "a")], "k long, s string") \
        .coalesce(1).write.parquet(str(gen))   # writes _SUCCESS
    # an UNcommitted sibling (no _SUCCESS) must stay invisible
    torn = local_root / "gen-00000000000000000008"
    torn.mkdir()
    (torn / "part-zzz.parquet").write_bytes(b"torn")

    root_uri = f"file:{local_root}"
    gens = _committed_generations(spark, root_uri)
    assert [g[0] for g in gens] == [7]
    assert gens[0][1].startswith("file:"), gens[0][1]
    assert gens[0][1].endswith("gen-00000000000000000007")
    got = read_cdc_table(spark, root_uri)
    assert [tuple(r) for r in got.collect()] == [(1, "a")]


def test_cdc_sink_schema_evolution(spark, tmp_path):
    """The long-running-pipeline case new_columns='add' exists for: a
    serving table committed under an OLD schema gains the column a
    later (restarted, wider) CDC stream carries — rows from the old
    era read NULL there, merged/inserted rows carry values, and the
    key-merge semantics are untouched. The narrow first run pins that
    evolution is opt-in per query."""
    import glob
    import os
    import shutil

    from fstd2pandas_spark.streaming import (apply_cdc_stream,
                                             read_cdc_table)

    root = str(tmp_path / "serving")

    def drop(zone, rows, schema, mtime):
        os.makedirs(zone, exist_ok=True)
        stage = str(tmp_path / f"stage_{os.path.basename(zone)}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        dst = os.path.join(zone, "b.parquet")
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                    dst)
        os.utime(dst, (mtime,) * 2)

    narrow = "k long, s string, ver long, del boolean"
    z1 = str(tmp_path / "z1")
    drop(z1, [(1, "a", 1, False), (2, "b", 1, False)], narrow,
         1_700_000_000)
    q1 = apply_cdc_stream(
        spark.readStream.schema(narrow).parquet(z1), root, ["k"],
        version_col="ver", delete_col="del",
        checkpoint_dir=str(tmp_path / "cp1"))
    q1.awaitTermination()
    assert read_cdc_table(spark, root).columns == ["k", "s"]

    # the pipeline restarts with a WIDER source — the committed table
    # lags the stream, which is exactly what evolution covers
    wide = "k long, s string, score double, ver long, del boolean"
    z2 = str(tmp_path / "z2")
    drop(z2, [(2, "b2", 0.5, 2, False), (3, "c", 0.7, 2, False)],
         wide, 1_700_000_100)
    q2 = apply_cdc_stream(
        spark.readStream.schema(wide).parquet(z2), root, ["k"],
        version_col="ver", delete_col="del",
        checkpoint_dir=str(tmp_path / "cp2"), new_columns="add")
    q2.awaitTermination()
    got = read_cdc_table(spark, root)
    assert got.columns == ["k", "s", "score"]
    assert {tuple(r) for r in got.collect()} == {
        (1, "a", None),       # pre-evolution row: NULL in the new col
        (2, "b2", 0.5),       # updated by the wide batch
        (3, "c", 0.7)}        # inserted by the wide batch

    # change feed ACROSS the evolution boundary: the narrow generation
    # aligns with NULL in the new column, so the untouched key is
    # correctly unchanged while the update/insert surface exactly
    from fstd2pandas_spark.streaming import cdc_changes

    gens = sorted(int(d[len("gen-"):]) for d in os.listdir(root)
                  if d.startswith("gen-"))
    feed = {(r["k"], r["s"], r["score"], r["_change_type"])
            for r in cdc_changes(spark, root, ["k"],
                                 gens[0], gens[1]).collect()}
    assert feed == {
        (2, "b", None, "update_preimage"),
        (2, "b2", 0.5, "update_postimage"),
        (3, "c", 0.7, "insert")}

    # without the opt-in, the same drift fails the micro-batch loudly
    z3 = str(tmp_path / "z3")
    wider = wide.replace("score double", "score double, extra long")
    drop(z3, [(4, "d", 0.1, 9, 3, False)], wider, 1_700_000_200)
    q3 = apply_cdc_stream(
        spark.readStream.schema(wider).parquet(z3), root, ["k"],
        version_col="ver", delete_col="del",
        checkpoint_dir=str(tmp_path / "cp3"))
    with pytest.raises(Exception, match="payload columns"):
        q3.awaitTermination()


def test_cdc_sink_holds_the_lease(spark, tmp_path):
    """Each CDC micro-batch holds the single-writer maintenance lease
    on the table root: two concurrent sinks would read the same
    committed head and allocate the SAME generation, one silently
    overwriting the other's merge. A held lease fails the batch (and
    the query) naming the owner; after release the same zone applies
    cleanly and the sink leaves no lock behind."""
    import glob
    import os
    import shutil

    from pyspark.errors import StreamingQueryException

    from fstd2pandas_spark.fsutil import maintenance_lease
    from fstd2pandas_spark.streaming import (apply_cdc_stream,
                                             read_cdc_table)

    root = str(tmp_path / "serving")
    zone = str(tmp_path / "zone")
    os.makedirs(zone)
    schema = "k long, s string, ver long, del boolean"
    stage = str(tmp_path / "stage")
    spark.createDataFrame([(1, "a", 1, False), (2, "b", 1, False)],
                          schema).coalesce(1) \
        .write.mode("overwrite").parquet(stage)
    shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                os.path.join(zone, "b0.parquet"))

    with maintenance_lease(spark, root, "rival-sink"):
        q = apply_cdc_stream(
            spark.readStream.schema(schema).parquet(zone), root,
            ["k"], version_col="ver", delete_col="del",
            checkpoint_dir=str(tmp_path / "cp_locked"))
        with pytest.raises(StreamingQueryException,
                           match="locked by rival-sink"):
            q.awaitTermination()
        # the failed batch committed nothing
        assert read_cdc_table(spark, root) is None

    # lease released: a fresh run applies the batch and unlocks
    q2 = apply_cdc_stream(
        spark.readStream.schema(schema).parquet(zone), root,
        ["k"], version_col="ver", delete_col="del",
        checkpoint_dir=str(tmp_path / "cp_ok"))
    q2.awaitTermination()
    assert {tuple(r) for r in
            read_cdc_table(spark, root).collect()} \
        == {(1, "a"), (2, "b")}
    assert not os.path.exists(os.path.join(root, ".maintenance-lock"))


def test_streaming_degenerate_input_guards(spark, tmp_path):
    """The record_stream whole-file review's silent-wrong-answer
    classes, pinned: (a) punctuation-only docs must NOT collapse into
    one md5('') group under normalized exact dedup (destructive
    mass-delete — the batch ledger's degenerate-form rule); (b) short
    documents (< shingle_k tokens) all share the MinHash SENTINEL
    signature and must fall back to exact hashing instead of being
    mass-deleted; (c) pre-existing reserved columns are refused, not
    silently overwritten; (d) a NULL ts is dropped (pandas converts
    NaT to int64-MIN, which would wedge the within-horizon funnel
    forever) and a NULL event_id must not crash the query; (e) a NaN
    arriving FIRST must not permanently poison running extrema;
    (f) interval-join misspelled columns fail crisply at call."""
    import os
    import uuid

    from fstd2pandas_spark.streaming.record_stream import (
        run_to_memory, running_extrema, streaming_exact_dedup,
        streaming_funnel, streaming_interval_join,
        streaming_signature_dedup)

    # (a) + (b): one drop zone of documents
    dz = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [(1, "!!!"), (2, "???"), (3, "!!!"),
         (4, "hi"), (5, "bye"),
         (6, "the quick brown fox jumps"),
         (7, "the quick brown fox jumps")],
        "doc_id long, text string")
    docs.coalesce(1).write.parquet(dz)

    n1 = f"sed_{uuid.uuid4().hex[:8]}"
    run_to_memory(streaming_exact_dedup(
        spark.readStream.schema("doc_id long, text string").parquet(dz),
        normalized=True), n1)
    texts = sorted(r["text"] for r in
                   spark.table(n1).select("text").collect())
    # '!!!' deduped against its copy only; '???' SURVIVES
    assert texts == ["!!!", "???", "bye", "hi",
                     "the quick brown fox jumps"]

    n2 = f"sgd_{uuid.uuid4().hex[:8]}"
    run_to_memory(streaming_signature_dedup(
        spark.readStream.schema("doc_id long, text string").parquet(dz),
        shingle_k=3), n2)
    texts2 = sorted(r["text"] for r in
                    spark.table(n2).select("text").collect())
    # 'hi' and 'bye' both survive (sentinel fallback to exact text);
    # the two real duplicates still collapse, as do '!!!' copies
    assert texts2 == ["!!!", "???", "bye", "hi",
                      "the quick brown fox jumps"]

    # (c) reserved columns refused
    withres = docs.withColumnRenamed("doc_id", "content_hash")
    with pytest.raises(ValueError, match="content_hash"):
        streaming_exact_dedup(withres)
    with pytest.raises(ValueError, match="sig"):
        streaming_signature_dedup(
            docs.withColumnRenamed("doc_id", "sig"))

    # (d) NULL ts dropped, NULL event_id ordered via sentinel — the
    # funnel still completes instead of crashing or wedging
    fz = str(tmp_path / "funl")
    import datetime as _dt
    t1 = _dt.datetime(2024, 1, 1, 10, 0, 0)
    t2 = _dt.datetime(2024, 1, 1, 10, 30, 0)
    spark.createDataFrame(
        [(1, None, 7, "view"), (1, t1, None, "view"),
         (1, t2, 3, "click")],
        "user_id long, ts timestamp, event_id long, event_type string"
    ).coalesce(1).write.parquet(fz)
    n3 = f"fun_{uuid.uuid4().hex[:8]}"
    run_to_memory(streaming_funnel(
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, "
            "event_type string").parquet(fz),
        ["view", "click"], within=7200), n3, output_mode="update")
    rows = spark.table(n3).collect()
    assert rows[-1]["depth"] == 2
    assert rows[-1]["first_step_us"] == int(t1.replace(
        tzinfo=_dt.timezone.utc).timestamp()) * 1_000_000

    # (e) NaN arriving FIRST does not poison the extrema
    ez = str(tmp_path / "ext")
    os.makedirs(ez)
    for i, arr in enumerate(([float("nan")], [1.0, 5.0])):
        stage = str(tmp_path / f"est{i}")
        spark.createDataFrame([("VV", arr)],
                              "nomvar string, d array<double>") \
            .coalesce(1).write.mode("overwrite").parquet(stage)
        import glob
        import shutil
        dst = os.path.join(ez, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                    dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)
    n4 = f"ext_{uuid.uuid4().hex[:8]}"
    run_to_memory(running_extrema(
        spark.readStream.schema("nomvar string, d array<double>")
        .option("maxFilesPerTrigger", "1").parquet(ez)),
        n4, output_mode="update")
    fin = spark.table(n4).orderBy(F.desc("n_seen")).collect()[0]
    assert (fin["n_seen"], fin["running_min"], fin["running_max"]) \
        == (3, 1.0, 5.0)

    # (f) interval-join misspelled columns fail at call time
    s1 = spark.readStream.schema("user_id long, ts timestamp") \
        .parquet(fz)
    with pytest.raises(ValueError, match="not in the left"):
        streaming_interval_join(s1, s1, left_time="tss")
    with pytest.raises(ValueError, match="not in the right"):
        streaming_interval_join(s1, s1.drop("ts"))


def test_vacuum_generations_tiers(spark, tmp_path):
    """vacuum_generations deletes dead UNCOMMITTED generations under
    the two-tier safety rule: seq <= committed head is always safe
    (the allocator only writes head+1, so such a directory can never
    gain a _SUCCESS), seq > head may be an in-flight write and falls
    only to quiesced=True. Committed generations are never touched and
    the visible table is unchanged throughout."""
    import os

    from fstd2pandas_spark.streaming import (read_cdc_table,
                                             vacuum_generations)

    root = tmp_path / "serving"
    for seq, val in ((5, "old"), (6, "cur")):
        spark.createDataFrame([(seq, val)], "k long, s string") \
            .coalesce(1).write.parquet(str(root / f"gen-{seq:020d}"))
    # dead: uncommitted at/below the head (crash whose replay
    # committed the same number elsewhere, then was abandoned)
    dead = root / "gen-00000000000000000004"
    dead.mkdir()
    (dead / "part-torn.parquet").write_bytes(b"torn")
    # possibly in-flight: uncommitted ABOVE the head
    inflight = root / "gen-00000000000000000007"
    inflight.mkdir()
    (inflight / "part-wip.parquet").write_bytes(b"wip")
    # strip the marker from neither committed gen — they stay
    assert (root / "gen-00000000000000000006" / "_SUCCESS").exists()

    # empty/absent root: no-op
    assert vacuum_generations(spark, str(tmp_path / "nope")) == []

    removed = vacuum_generations(spark, str(root))
    assert removed == ["gen-00000000000000000004"]
    assert inflight.exists()           # above head, not quiesced
    removed2 = vacuum_generations(spark, str(root), quiesced=True)
    assert removed2 == ["gen-00000000000000000007"]
    gens_left = sorted(d for d in os.listdir(root)
                       if d.startswith("gen-"))
    assert gens_left == ["gen-00000000000000000005",
                         "gen-00000000000000000006"]
    assert [tuple(r) for r in
            read_cdc_table(spark, str(root)).collect()] == [(6, "cur")]


def test_streaming_ingest_then_compaction(spark, tmp_path):
    """Streaming → compaction, chained (r12 order item #6): a
    multi-batch file-source ingest appends micro-batches to a
    hive-partitioned fact table through foreachBatch — EXACTLY the
    small-file debris case compaction exists for (each batch leaves
    its own files in every partition it touches; foreachBatch, not the
    parquet streaming sink, because compaction's renames would
    invalidate that sink's _spark_metadata log). Compaction then
    rewrites the fragmented partitions while the serving reads stay
    identical: order-free fingerprints match pre/post, and the next
    incremental cycle's snapshot diff sees NO phantom changes."""
    import glob
    import os
    import shutil

    from fstd2pandas_spark.plans.compaction import (
        compact_partitions, compaction_plan)
    from fstd2pandas_spark.plans.snapshot import (
        changed_partitions, partition_fingerprints)

    fact = str(tmp_path / "fact")
    zone = str(tmp_path / "zone")
    os.makedirs(zone)
    schema = "day long, u long, v long"
    batches = [
        [(d, 10 * i + d, (7 * i + d) % 50) for d in (0, 1) for i in range(6)],
        [(d, 1000 + 10 * i + d, i % 9) for d in (1, 2) for i in range(6)],
        [(d, 2000 + 10 * i + d, i) for d in (0, 2) for i in range(6)],
    ]
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"ing_b{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        dst = os.path.join(zone, f"batch_{i}.parquet")
        shutil.copy(glob.glob(os.path.join(stage, "part-*.parquet"))[0],
                    dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    def _ingest(batch_df, _bid):
        batch_df.write.mode("append").partitionBy("day").parquet(fact)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", "1").parquet(zone)
         .writeStream.foreachBatch(_ingest)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    plan0 = {e["rel"]: e for e in
             compaction_plan(spark, fact, ["day"], 1 << 30)}
    # every day partition was hit by two of the three batches
    assert sorted(plan0) == ["day=0", "day=1", "day=2"]
    assert all(e["n_files"] >= 2 and e["needs"] for e in plan0.values())

    def snap():
        return partition_fingerprints(
            spark.read.parquet(fact), ["day"], ["u", "v"])

    def serving():
        return {tuple(r) for r in
                spark.read.parquet(fact).groupBy("day")
                .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
                .collect()}

    before_fp = snap().localCheckpoint()
    before_serving = serving()
    stats = compact_partitions(spark, fact, ["day"], 1 << 30,
                               verify=True)
    assert sorted(stats["compacted"]) == ["day=0", "day=1", "day=2"]
    assert stats["files_before"] >= 6 and stats["files_after"] == 3
    assert serving() == before_serving
    # the next incremental cycle sees no phantom changes
    assert changed_partitions(snap(), before_fp, ["day"]).count() == 0


# --------------------------------------------------------------- round 18
# Bounded streaming offsets (VERDICT r17 order #1): latestOffset used to
# return the FULL accumulated file list — O(all-files-ever) driver work
# and checkpoint JSON per trigger on a long-running stream. The offset is
# now a (mtime_ns, path) high-water cursor plus a late-file grace set, so
# its serialized size depends only on how many files carry mtimes inside
# the grace window — never on the total ingested file count.


def _tiny_rec(i):
    import numpy as np

    return dict(nomvar="TT", typvar="P", etiket=f"OFF{i:03d}", grtyp="Z",
                ni=2, nj=2, nk=1, dateo=442998800, ip1=i, ip2=0, ip3=i,
                deet=300, npas=i, datyp=5, nbits=32, ig1=1, ig2=2,
                ig3=0, ig4=0, datev=442998800 + 8 * i,
                d=np.arange(4, dtype="<f4") + i)


def test_stream_offsets_bounded(tmp_path):
    """Serialized offset size is independent of total files ingested:
    6 micro-batches x 5 files, each batch's mtimes one hour past the
    previous (far beyond the 300 s grace window) — every offset holds
    at most one batch's grace entries, and each batch reads exactly its
    own files, once."""
    import json
    import os

    from fstd2pandas_spark.sources.fst_datasource import FstRecStreamReader
    from fstd2pandas_spark.sources.fstrec_format import write_fstrec

    zone = tmp_path / "zone"
    zone.mkdir()
    reader = FstRecStreamReader({"path": str(zone)})
    start = reader.initialOffset()
    t0 = 1_600_000_000  # epoch seconds; pure ordering, not wall clock
    sizes, seen = [], set()
    for batch in range(6):
        expect = []
        for i in range(5):
            p = zone / f"b{batch:02d}_{i}.fstrec"
            write_fstrec(str(p), [_tiny_rec(batch * 5 + i)])
            ts = t0 + batch * 3600 + i
            os.utime(p, (ts, ts))
            expect.append(str(p))
        end = reader.latestOffset()
        parts = reader.partitions(start, end)
        got = sorted(q.path for q in parts)
        assert got == sorted(expect), f"batch {batch}: {got}"
        assert not (set(got) & seen), "file re-read across batches"
        seen.update(got)
        sizes.append(len(json.dumps(end)))
        # grace set holds only the current batch's in-window files
        assert len(end["grace"]) <= 5
        start = end
    # O(grace window), not O(total files): the 6th offset is no bigger
    # than the 1st (30 files ingested vs 5)
    assert sizes[-1] <= sizes[0] + 8, sizes

    # restart semantics: a FRESH reader instance (latestOffset is a
    # pure function of the listing — no in-process state needed) sees
    # everything consumed per the checkpointed offset
    fresh = FstRecStreamReader({"path": str(zone)})
    final = fresh.latestOffset()
    assert sorted(q.path for q in fresh.partitions(start, final)) == []


def test_stream_offsets_late_file_within_grace(tmp_path):
    """A file landing with an mtime slightly OLDER than the high-water
    mark (the writer's two-phase commit can publish A after B when A
    finished writing first) is still picked up exactly once, as long as
    it is inside the grace window."""
    import os

    from fstd2pandas_spark.sources.fst_datasource import FstRecStreamReader
    from fstd2pandas_spark.sources.fstrec_format import write_fstrec

    zone = tmp_path / "zone"
    zone.mkdir()
    reader = FstRecStreamReader({"path": str(zone)})
    start = reader.initialOffset()
    t0 = 1_600_000_000

    pb = zone / "b.fstrec"
    write_fstrec(str(pb), [_tiny_rec(1)])
    os.utime(pb, (t0 + 100, t0 + 100))
    end1 = reader.latestOffset()
    assert [q.path for q in reader.partitions(start, end1)] == [str(pb)]

    # A publishes AFTER the first trigger with an OLDER mtime (inside
    # the 300 s grace window)
    pa = zone / "a.fstrec"
    write_fstrec(str(pa), [_tiny_rec(2)])
    os.utime(pa, (t0 + 40, t0 + 40))
    end2 = reader.latestOffset()
    parts2 = [q.path for q in reader.partitions(end1, end2)]
    assert parts2 == [str(pa)], parts2
    # ...and never again
    end3 = reader.latestOffset()
    assert reader.partitions(end2, end3) == []


def test_stream_offsets_legacy_full_list(tmp_path):
    """Checkpoints written by the pre-r18 source carried the full file
    list ({"files": [...]}); a restart against such an offset must not
    re-read those files."""
    import os

    from fstd2pandas_spark.sources.fst_datasource import FstRecStreamReader
    from fstd2pandas_spark.sources.fstrec_format import write_fstrec

    zone = tmp_path / "zone"
    zone.mkdir()
    t0 = 1_600_000_000
    old, new = zone / "old.fstrec", zone / "new.fstrec"
    for i, p in enumerate((old, new)):
        write_fstrec(str(p), [_tiny_rec(i)])
        os.utime(p, (t0 + i, t0 + i))
    reader = FstRecStreamReader({"path": str(zone)})
    legacy = {"files": [str(old)]}
    end = reader.latestOffset()
    got = [q.path for q in reader.partitions(legacy, end)]
    assert got == [str(new)], got


def test_stream_listing_stats_only_new_files(tmp_path, monkeypatch):
    """The per-trigger listing stats each file once per RUN, not once
    per trigger: published container files are immutable (the writer's
    two-phase commit never rewrites a name), so mtimes are cached and
    a long-running stream's driver cost per trigger is O(listdir +
    new files), not O(all files) stat calls."""
    import os

    from fstd2pandas_spark.sources import fst_datasource as fd
    from fstd2pandas_spark.sources.fstrec_format import write_fstrec

    zone = tmp_path / "zone"
    zone.mkdir()
    t0 = 1_600_000_000
    for i in range(10):
        p = zone / f"a{i}.fstrec"
        write_fstrec(str(p), [_tiny_rec(i)])
        os.utime(p, (t0 + i, t0 + i))
    reader = fd.FstRecStreamReader({"path": str(zone)})
    start = reader.initialOffset()
    real_stat = os.stat
    calls = []

    def counting_stat(p, *a, **k):
        calls.append(str(p))
        return real_stat(p, *a, **k)

    monkeypatch.setattr(fd, "_stat_ns", lambda p: counting_stat(p).st_mtime_ns)
    end1 = reader.latestOffset()
    first_round = len(calls)
    assert first_round == 10
    assert len(reader.partitions(start, end1)) == 10
    calls.clear()
    # next trigger: one new file -> exactly one stat
    pn = zone / "b_new.fstrec"
    write_fstrec(str(pn), [_tiny_rec(99)])
    os.utime(pn, (t0 + 100, t0 + 100))
    end2 = reader.latestOffset()
    assert [q.path for q in reader.partitions(end1, end2)] == [str(pn)]
    assert calls == [str(pn)], calls
