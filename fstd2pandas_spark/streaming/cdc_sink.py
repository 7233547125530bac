"""Streaming CDC sink — :func:`~fstd2pandas_spark.plans.merge.
merge_upsert` applied per micro-batch through ``foreachBatch``,
closing the loop between the batch maintenance suite and the
streaming layer: a change-data-capture stream (upserts + tombstones,
possibly several versions of one key per batch) continuously
maintains a key-addressed serving table on plain parquet.

Commit protocol (generation MVCC, atomic by construction):

- each micro-batch writes the FULL post-merge table to a fresh
  generation directory ``gen-<seq zero-padded>`` under the table
  root, where ``seq`` = highest COMMITTED generation + 1 (not the
  stream's ``batchId`` — a checkpoint reset restarts batchIds at 0,
  which would write generations BEHIND the current head and leave
  the replayed table invisible);
- a generation is visible if and only if Spark's ``_SUCCESS`` marker
  exists in it (the FileOutputCommitter contract) — readers
  (:func:`read_cdc_table`) list the generation directories and open
  the highest-numbered committed one, so there is NO pointer file to
  torn-write and NO rename window in which the table is absent;
- a crash MID-write leaves an uncommitted directory; the replayed
  batch allocates the same number (the committed head is unchanged)
  and overwrites it. A crash AFTER commit but before the checkpoint
  records it re-delivers the batch, which writes a NEW generation —
  with identical content, because the merge is idempotent;
- older generations are garbage-collected after each commit
  (``keep_generations`` retained so a reader mid-scan of the previous
  generation is not yanked; raise it for long-running readers).

Idempotent replay is the load-bearing property: Structured Streaming's
``foreachBatch`` is at-least-once — after a failure the LAST batch is
re-delivered. Re-merging an already-applied CDC batch converges:
exact duplicates collapse, latest-wins re-resolves to the same rows,
an upsert re-applies the same values, and a tombstone for the
already-deleted key is the documented absent-key no-op. The tests pin
a full from-scratch replay (fresh checkpoint over the same drop zone)
landing on the identical table.

Scale honesty: each batch rewrites the WHOLE table — generation-level
copy-on-write, the plain-parquet analog of Delta/Iceberg's file-level
one. That is the right trade for a dimension/serving table (the
common CDC target — keys-sized, orders of magnitude smaller than the
facts); for a fact-scale target, partition the root and pair the
stream with the incremental suite (snapshot diff + refresh +
compaction) instead of merging into one monolith. The merge itself
pays exactly the batch operator's cost: one CDC-side window + the
key-join (bucketing/``keys_not_null`` apply unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fstd2pandas_spark.fsutil import (delete_checked, hadoop_fs,
                                      jpath, maintenance_lease)
from fstd2pandas_spark.plans.merge import merge_upsert

_GEN_PREFIX = "gen-"


def _list_generations(spark: SparkSession, table_root: str,
                      ) -> "list[tuple[int, str, bool]]":
    """ONE definition of the generation-directory listing (the
    _widen/third-copy precedent): sorted ``(seq, path, committed)``
    for every ``gen-*`` directory, committed = ``_SUCCESS`` present.
    One LIST of the root + one exists() per generation.

    Paths are FULLY QUALIFIED (``str(Path)`` keeps scheme+authority —
    the fsutil contract): a ``toUri().getPath()``-stripped
    ``s3a://bucket/serving/gen-...`` would silently resolve against
    the cluster's default filesystem when handed back to
    ``spark.read`` or a delete."""
    fs, root = hadoop_fs(spark, table_root)
    if not fs.exists(root):
        return []
    gens = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(_GEN_PREFIX)):
            continue
        try:
            bid = int(name[len(_GEN_PREFIX):])
        except ValueError:
            continue
        ok = fs.exists(jpath(spark, str(st.getPath()), "_SUCCESS"))
        gens.append((bid, str(st.getPath()), ok))
    return sorted(gens)


def _committed_generations(spark: SparkSession,
                           table_root: str) -> "list[tuple[int, str]]":
    """Sorted (batch_id, path) of generations carrying ``_SUCCESS``."""
    return [(b, p) for b, p, ok in _list_generations(spark, table_root)
            if ok]


def _require_gen(name: str, value, allow_none: bool = True):
    """Generation parameters must be real ints: a bool slips through
    dict lookups via bool-int equality (``False == 0`` would silently
    time-travel to generation 0), and ``None`` where a number is
    required silently degrades to head-vs-head."""
    if value is None and allow_none:
        return
    if not isinstance(value, int) or isinstance(value, bool):
        raise ValueError(
            f"{name} must be a committed generation number (int), "
            f"got {value!r}")


def vacuum_generations(spark: SparkSession, table_root: str,
                       quiesced: bool = False) -> "list[str]":
    """Delete dead UNCOMMITTED generation directories (no ``_SUCCESS``)
    and return their names. Committed generations are never touched —
    the sink's own GC owns those.

    Two safety tiers (the Delta VACUUM contract, made explicit):

    - ``seq <= committed head``: always safe. The allocator only ever
      writes ``head + 1``, so an uncommitted directory at or below the
      head can never gain a marker — it is debris from a crash whose
      replay committed the same number (overwrite re-creates the dir,
      so a lingering one means the crash state itself was abandoned).
    - ``seq > committed head``: possibly an IN-FLIGHT write; deleted
      only with ``quiesced=True``, the caller's assertion that no
      writer is running against this table (an abandoned stream's last
      torn write is the real-world case).

    ONE listing drives both the committed view and the sweep — a
    second listing could straddle a commit and misclassify it."""
    gens = _list_generations(spark, table_root)
    if not gens:
        return []
    fs, _root = hadoop_fs(spark, table_root)
    head = max((b for b, _p, ok in gens if ok), default=-1)
    removed = []
    for bid, p, ok in gens:
        if ok:
            continue
        if bid <= head or quiesced:
            # reported only if the delete actually happened — the
            # caller trusts this list as "now clean"
            if delete_checked(fs, jpath(spark, p),
                              what="uncommitted generation"):
                removed.append(p.rsplit("/", 1)[-1])
    return sorted(removed)


def read_cdc_table(spark: SparkSession, table_root: str,
                   generation: "int | None" = None,
                   ) -> "DataFrame | None":
    """The committed state of a table maintained by
    :func:`apply_cdc_stream`: the highest-numbered ``_SUCCESS``-marked
    generation, or — ``generation=N`` — that specific committed one
    (time travel, bounded by the sink's ``keep_generations`` retention
    window; a vacuumed or never-committed number raises with the
    retained set). None before the first commit (callers bootstrapping
    a pipeline treat that as an empty table)."""
    _require_gen("generation", generation)
    gens = _committed_generations(spark, table_root)
    if generation is None:
        if not gens:
            return None
        return spark.read.parquet(gens[-1][1])
    by = dict(gens)
    if generation not in by:
        raise ValueError(
            f"generation {generation} is not committed under "
            f"{table_root} — retained: {sorted(by)} (the sink GCs past "
            "keep_generations; raise it for longer time travel)")
    return spark.read.parquet(by[generation])


def cdc_changes(spark: SparkSession, table_root: str,
                keys: "list[str]", from_generation: int,
                to_generation: "int | None" = None) -> DataFrame:
    """Row-level change feed between two committed generations of the
    serving table — the Delta Change-Data-Feed read, computed by
    snapshot diff (:func:`~fstd2pandas_spark.plans.merge.change_feed`)
    instead of a transaction log: what a downstream consumer must
    apply to move from ``from_generation`` to ``to_generation``
    (default: the current head). Both snapshots are serving-table
    sized, so the diff join is cheap at any corpus size; retention is
    the sink's ``keep_generations`` window. ONE directory listing
    resolves both generations — besides halving the object-store LIST
    round-trips, it pins the pair to a single consistent snapshot of
    the table (two listings could straddle a commit)."""
    from fstd2pandas_spark.plans.merge import change_feed

    if from_generation is None:
        raise ValueError(
            "from_generation must be a committed generation number — "
            "got None; that would silently diff the head against "
            "itself (an always-empty feed)")
    _require_gen("from_generation", from_generation, allow_none=False)
    _require_gen("to_generation", to_generation)
    gens = dict(_committed_generations(spark, table_root))
    if not gens:
        raise ValueError(
            f"no committed generations under {table_root}")
    head = max(gens)
    if to_generation is None:
        to_generation = head
    for g in (from_generation, to_generation):
        if g not in gens:
            raise ValueError(
                f"generation {g} is not committed under {table_root} "
                f"— retained: {sorted(gens)} (the sink GCs past "
                "keep_generations; raise it for longer time travel)")
    if from_generation > to_generation:
        raise ValueError(
            f"from_generation {from_generation} > to_generation "
            f"{to_generation} — an inverted range would emit a feed "
            "that moves consumers BACKWARD (the Delta CDF start<=end "
            "rule); swap the arguments if a reverse diff is intended")
    return change_feed(spark.read.parquet(gens[from_generation]),
                       spark.read.parquet(gens[to_generation]), keys)


def apply_cdc_stream(cdc_stream: DataFrame, table_root: str,
                     keys: "list[str]",
                     version_col: "str | None" = None,
                     delete_col: "str | None" = None,
                     checkpoint_dir: "str | None" = None,
                     keys_not_null: bool = False,
                     keep_generations: int = 2,
                     available_now: bool = True,
                     new_columns: str = "error",
                     break_lease: bool = False,
                     lease_ttl_sec: float = 3600.0):
    """Start the CDC sink: every micro-batch of ``cdc_stream`` is
    MERGEd (:func:`merge_upsert` semantics — latest-wins by
    ``version_col``, tombstones via ``delete_col``, whole-row
    replacement) into the table at ``table_root`` under the
    generation commit protocol described in the module docstring.
    Returns the started ``StreamingQuery``.

    The payload schema is the stream's columns minus
    ``version_col``/``delete_col``; the first batch bootstraps the
    table from empty. ``available_now=True`` (the default) drains the
    source and stops — the deterministic-replay mode the tests use;
    pass False for a continuously-running sink. ``new_columns='add'``
    forwards merge_upsert's schema evolution: a committed table whose
    schema predates a column gains it on the next merge (old rows
    NULL) — the normal life of a long-running CDC pipeline. The
    stream's OWN schema is fixed at start by Structured Streaming;
    evolution covers the serving table lagging the stream (restart
    the query to pick up a wider source).

    Each micro-batch holds the single-writer maintenance lease on
    ``table_root`` for its read-head → merge → write → GC critical
    section (:func:`~fstd2pandas_spark.fsutil.maintenance_lease`):
    two concurrent sinks on one table would otherwise read the same
    head and allocate the SAME generation, one silently overwriting
    the other's merge. A held lease fails the batch naming the owner
    (and the query with it — at-least-once redelivers the batch); a
    hard-killed run's stale lease (age > ``lease_ttl_sec``) is broken
    only under explicit ``break_lease=True``. Honesty on object
    stores: the generation protocol itself is rename-free and works
    on a flat namespace, but there create-exclusive is best-effort,
    so the lease is ADVISORY (it warns at acquisition) — coordinate
    concurrent sinks externally on s3a/gs/... roots."""
    if keep_generations < 1:
        raise ValueError("keep_generations must be >= 1")
    if not available_now and checkpoint_dir is None:
        raise ValueError(
            "a continuous sink (available_now=False) needs a "
            "checkpoint_dir: without recoverable offsets every restart "
            "replays the whole source, and the replay's intermediate "
            "generations visibly REGRESS the table (and feed phantom "
            "backward changes to cdc_changes consumers) until it "
            "catches up")
    # eager schema validation: inside foreachBatch these would only
    # surface as an ASYNC failure on the first micro-batch — invisible
    # to a fire-and-forget continuous caller that never awaits
    cols = set(cdc_stream.columns)
    missing = [c for c in (*keys, version_col, delete_col)
               if c is not None and c not in cols]
    if missing:
        raise ValueError(
            f"columns {missing} not in the CDC stream schema "
            f"{sorted(cols)}")
    meta = {c for c in (version_col, delete_col) if c}
    overlap = sorted(meta & set(keys))
    if overlap:
        raise ValueError(
            f"version_col/delete_col {overlap} cannot also be key "
            "columns — the payload projection would drop the key")
    payload = [c for c in cdc_stream.columns if c not in meta]
    root = table_root.rstrip("/")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # a no-op batch must not rewrite the whole table into a
            # fresh generation (full-table I/O) nor burn a retention
            # slot on an identical copy
            return
        spark = batch_df.sparkSession
        with maintenance_lease(spark, root, "apply_cdc_stream",
                               ttl_sec=lease_ttl_sec,
                               break_lease=break_lease):
            _merge_batch(spark, batch_df)

    def _merge_batch(spark: SparkSession, batch_df: DataFrame) -> None:
        gens0 = _committed_generations(spark, root)
        if gens0:
            target = spark.read.parquet(gens0[-1][1])
            seq = gens0[-1][0] + 1
        else:
            target = spark.createDataFrame([], batch_df.select(
                *payload).schema)
            seq = 0
        merged = merge_upsert(target, batch_df, keys,
                              version_col=version_col,
                              delete_col=delete_col,
                              keys_not_null=keys_not_null,
                              new_columns=new_columns)
        gen = f"{root}/{_GEN_PREFIX}{seq:020d}"
        merged.write.mode("overwrite").parquet(gen)
        # ONE post-write listing serves two duties: (1) commit
        # visibility — on a cluster with _SUCCESS markers disabled
        # (mapreduce.fileoutputcommitter.marksuccessfuljobs=false,
        # common on object stores) every merge would otherwise be
        # silently INVISIBLE, each batch re-bootstrapping from empty
        # while the stream reports success; (2) the GC window.
        gens = _committed_generations(spark, root)
        if seq not in {b for b, _p in gens}:
            raise IOError(
                f"CDC sink: generation {seq} was written but is not "
                f"visible under {root} — no _SUCCESS marker appeared "
                "(is mapreduce.fileoutputcommitter."
                "marksuccessfuljobs=false on this cluster?). The "
                "commit protocol gates visibility on the marker; "
                "without it every batch would silently re-bootstrap "
                "from an empty table")
        fs, _ = hadoop_fs(spark, root)
        for _bid, p in gens[:-keep_generations]:
            delete_checked(fs, jpath(spark, p),
                           what="expired generation")

    writer = cdc_stream.writeStream.foreachBatch(_apply)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
