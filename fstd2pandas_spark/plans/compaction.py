"""Small-file compaction — the OPTIMIZE primitive that closes the
maintenance loop: fingerprint → diff → refresh → MERGE → quality
gates manage CONTENT, but every MERGE/refresh rewrite and every
streaming micro-batch leaves small-file debris behind, and at 100 TB
a partition fragmented into thousands of kilobyte files turns each
scan into a listing + open-file storm. This module bin-packs the
fragmented partitions of a hive-partitioned parquet dataset back to
a target file size — and NEVER changes content (the invariant the
test gates with :func:`~fstd2pandas_spark.plans.snapshot.
partition_fingerprints`: the snapshot module is compaction's own
oracle).

Scale shape:

- The PLAN is pure metadata-plane work: one driver-side filesystem
  listing (the same plane Delta's OPTIMIZE and Iceberg's rewrite
  action operate on), partitions-x-files-sized, no data read.
- The REWRITE is ONE Spark job over the touched partitions only: a
  literal partition-pruned scan (the incremental_refresh convention —
  the filter references only partition columns, so it lands in
  ``PartitionFilters`` and untouched partitions are never opened),
  one hash exchange on the partition columns (each partition's rows
  converge on exactly one task), and ``maxRecordsPerFile`` splits the
  output at the target size. Untouched partitions are not read, not
  written, not moved.
- The SWAP is a bounded driver loop over the touched partitions
  (``max_partitions`` raises loudly past the cap — the prune_limit
  convention): per partition, the old directory is renamed to a
  dot-prefixed sibling (invisible to Spark/Hadoop listings at any
  level), the new directory renamed in, the hidden one deleted.
  Renames are O(1) metadata ops on HDFS/posix; a flat-namespace
  object store (s3a/gs/...) turns them into data COPIES, so such
  paths are REFUSED unless ``allow_nonatomic_rename=True`` (a table
  format with a transaction log is the right tool there).

Honesty about atomicity: plain parquet has no transaction log, so a
crash between the two renames leaves that ONE partition temporarily
absent (its data intact under the hidden ``.compact-old-*`` name —
recovery is a rename back). No crash window can produce duplicate or
torn content, which is the failure mode that silently corrupts
results; Delta/Iceberg buy full atomicity with their logs.
:func:`recover_compaction` repairs every reachable crash state
mechanically: the hidden name ENCODES the original leaf directory
(``.compact-old-<hex>-<leaf>``), so a hidden dir whose target is
missing is restored by rename and one whose target exists is a
superseded pre-swap copy and is deleted; crashed rewrite temp dirs
are swept last. :func:`compact_partitions` refuses to start while
such debris exists (run recovery first) — that single-writer
handshake is what keeps every crash state decidable.

Determinism contract: row order WITHIN the rewritten files follows
shuffle arrival and is not reproducible, but the row MULTISET per
partition is bit-identical — which is exactly what the order-free
fingerprint sums certify (``verify=True`` recomputes them in-process
and raises on any drift before declaring success).
"""

from __future__ import annotations

import functools
import math
import re
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fstd2pandas_spark.fsutil import (FLAT_NAMESPACE_SCHEMES,
                                      delete_checked, fs_scheme,
                                      hadoop_fs, jpath,
                                      maintenance_lease)
from fstd2pandas_spark.plans.incremental import balanced_any

#: hive's spelling of a NULL partition value in directory names
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

#: swap-loop ceiling (the MAX_PRUNE_PARTITIONS convention): a
#: compaction touching more partitions than this should be split into
#: windows by the caller, not silently serialized through one driver.
MAX_COMPACT_PARTITIONS = 10_000

#: hidden-dir prefix the swap loop renames originals to; the rest of
#: the name is ``<12 hex>-<original leaf>`` so recovery is decidable
_HIDDEN_PREFIX = ".compact-old-"

#: hidden-dir prefix :func:`expire_partitions` renames condemned
#: partitions to before deleting them — distinct from
#: ``.compact-old-`` because the RECOVERY action differs: an expired
#: copy is always deleted (the rename IS the expiry commit), never
#: restored (that would resurrect data the caller asked to remove)
_EXP_PREFIX = ".compact-exp-"

#: rewrite temp dirs are EXACTLY ``<base>.compact-<12 hex>`` — both
#: the pre-flight debris check and the recovery sweep match this full
#: format, so a user's ``table.compact-backup`` sibling is never
#: mistaken for ours (and never deleted)
_TMP_SUFFIX_RE = r"\.compact-[0-9a-f]{12}$"

#: Spark's bucket-id file-name marker: ``part-...-<uuid>_00003.c000...``
#: — the ``_NNNNN`` between the task uuid and the writer's ``.cNNN``
#: suffix encodes which bucket the file holds. ANCHORED to the full
#: writer shape (part- prefix, extension dot after cNNN) so an
#: externally-named file that merely contains ``_00042.c001``
#: somewhere does not falsely brick compaction of the dataset.
_BUCKET_FILE_RE = re.compile(r"^part-.*_\d{5}\.c\d{3}\.")


#: ONE definition of the flat-namespace scheme set and the scheme
#: probe lives in fsutil (the lease warns on the same property this
#: module refuses on); the module-level aliases keep this file's
#: refusal independently monkeypatchable in tests.
_FLAT_NAMESPACE_SCHEMES = FLAT_NAMESPACE_SCHEMES
_fs_scheme = fs_scheme


def _require_atomic_rename(fs, path: str, allow: bool,
                           who: str) -> None:
    """The swap protocol's honesty check: on a flat-namespace object
    store every ``rename`` is a COPY of all data + delete, so the
    documented O(1)-metadata crash window between the two swap renames
    becomes O(partition bytes) of copy time — at 100 TB that is
    minutes per partition during which the partition is absent, and a
    mid-copy crash leaves a PARTIAL hidden dir recovery would restore
    verbatim. Refuse unless the caller opts in; a table format with a
    transaction log (Delta/Iceberg) is the right tool there."""
    scheme = _fs_scheme(fs)
    if not allow and scheme and scheme.lower() in \
            _FLAT_NAMESPACE_SCHEMES:
        raise RuntimeError(
            f"{who}: {path} resolves to the flat-namespace object "
            f"store scheme {scheme!r}, where rename is a COPY of "
            "every byte + delete — the swap's documented O(1) crash "
            "window becomes O(data) copy time and a mid-copy crash "
            "leaves PARTIAL hidden dirs. Pass "
            "allow_nonatomic_rename=True to proceed anyway, or use a "
            "table format with a transaction log (Delta/Iceberg) for "
            "object-store tables")


def _is_hidden(name: str) -> bool:
    return name.startswith(".") or name.startswith("_")


def _list_partitions(spark: SparkSession, path: str,
                     part_cols: "list[str]",
                     debris_out: "list | None" = None) -> "list[dict]":
    """Walk the hive layout ``path/col1=v1/.../colN=vN/files`` and
    return one entry per leaf partition: the relative directory, the
    decoded partition values (HIVE_NULL -> None), file count and
    total bytes. Raises if the layout does not match ``part_cols``.
    ``debris_out`` (if given) collects the relative paths of
    ``.compact-old-*`` / ``.compact-exp-*`` crash-debris dirs seen
    DURING the same walk — debris detection costs no extra
    listing."""
    from urllib.parse import unquote

    fs, root = hadoop_fs(spark, path)

    def walk(jdir, rel: str, vals: tuple, depth: int):
        entries = []
        col = part_cols[depth]
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            if _is_hidden(name):
                if depth == 0 and name == "_spark_metadata" \
                        and st.isDirectory():
                    # the sink hazard is detected at the same altitude
                    # as the bucket one: in the shared plan walk, so
                    # compaction_plan refuses too — a caller driving
                    # its own rewrite off the plan would otherwise
                    # strand the sink's log-driven readers on deleted
                    # files
                    raise RuntimeError(
                        "compaction: _spark_metadata transaction log "
                        f"present — {path} is a Structured Streaming "
                        "parquet-sink output, whose readers list "
                        "files through the LOG, not the directory; "
                        "rewriting/renaming its files would leave "
                        "them reading deleted files. Ingest through "
                        "foreachBatch (see streaming/cdc_sink.py) if "
                        "the table must be compactable")
                if (debris_out is not None and st.isDirectory()
                        and name.startswith((_HIDDEN_PREFIX,
                                             _EXP_PREFIX))):
                    debris_out.append(f"{rel}/{name}" if rel else name)
                continue
            if not st.isDirectory() or "=" not in name:
                raise ValueError(
                    f"compaction: {rel or '.'} contains {name!r} "
                    f"where a {col}=<value> partition directory was "
                    f"expected — the dataset is not hive-partitioned "
                    f"on {part_cols}")
            c, raw = name.split("=", 1)
            if c != col:
                raise ValueError(
                    f"compaction: directory {name!r} under "
                    f"{rel or '.'} does not match partition column "
                    f"{col!r} (layout order must equal part_cols)")
            v = None if raw == HIVE_NULL else unquote(raw)
            nrel = f"{rel}/{name}" if rel else name
            sub = st.getPath()
            if depth + 1 < len(part_cols):
                entries.extend(walk(sub, nrel, vals + (v,), depth + 1))
            else:
                files = [f for f in fs.listStatus(sub)
                         if f.isFile()
                         and not _is_hidden(f.getPath().getName())]
                entries.append({
                    "rel": nrel,
                    "values": vals + (v,),
                    "n_files": len(files),
                    "bytes": sum(f.getLen() for f in files),
                    # Spark bucket files carry `_NNNNN` (the bucket
                    # id) before the `.cNNN` writer suffix — a layout
                    # compaction MUST NOT touch (see compact_partitions)
                    "bucketed": any(
                        _BUCKET_FILE_RE.search(f.getPath().getName())
                        for f in files)})
        return entries

    return walk(root, "", (), 0)


def compaction_plan(spark: SparkSession, path: str,
                    part_cols: "list[str]",
                    target_bytes: int,
                    debris_out: "list | None" = None) -> "list[dict]":
    """One dict per leaf partition: ``rel`` (directory relative to
    ``path``), ``values`` (decoded partition values, None for the
    hive NULL partition), ``n_files``, ``bytes``, ``n_ideal``
    (``ceil(bytes / target_bytes)``, min 1), ``needs`` (more files
    than ideal — the partitions :func:`compact_partitions` would
    rewrite) and ``bucketed`` (Spark bucket-id file names detected —
    :func:`compact_partitions` REFUSES such a plan, because rewriting
    a bucketed layout voids the bucket-to-file contract; ``needs`` is
    moot for it). A Structured Streaming parquet-sink output
    (``_spark_metadata`` log) raises during the walk itself — its
    readers list files through the log, so no plan over it is safe to
    execute. Pure metadata-plane: one filesystem listing, no data
    read (``debris_out`` piggybacks on it — see
    :func:`_list_partitions`)."""
    if not part_cols:
        raise ValueError("need at least one partition column")
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    plan = _list_partitions(spark, path, part_cols, debris_out)
    for e in plan:
        e["n_ideal"] = max(1, math.ceil(e["bytes"] / target_bytes))
        e["needs"] = e["n_files"] > e["n_ideal"]
    return plan


def _touch_filter(part_cols: "list[str]", dtypes: dict,
                  touched: "list[dict]"):
    """Literal partition filter over the touched partitions — typed
    literals (``cast('3' as bigint)`` constant-folds) compared
    null-safely so the filter stays a pure partition predicate that
    Catalyst turns into PartitionFilters (the incremental_refresh
    lesson). Balanced OR tree: a left-deep chain over thousands of
    touched partitions would blow Catalyst's analysis stack."""
    def one(e):
        terms = [
            F.col(c).eqNullSafe(
                F.lit(v).cast(dtypes[c]) if v is not None
                else F.lit(None).cast(dtypes[c]))
            for c, v in zip(part_cols, e["values"])]
        return functools.reduce(lambda x, y: x & y, terms)

    return balanced_any([one(e) for e in touched])


def _rewrite_frame(pruned, part_cols: "list[str]",
                   order_by: "list[str] | None"):
    """The rewrite plan over the pruned slice — ONE hash exchange on
    the partition columns (each partition's rows converge on exactly
    one task, so a partition under ``maxRecordsPerFile`` becomes
    exactly one file); ``order_by`` clusters rows WITHIN the task
    (``sortWithinPartitions`` — local sort, no extra exchange).
    Extracted so the plan-lock test pins the operator's real shape."""
    w = pruned.repartition(*[F.col(c) for c in part_cols])
    if order_by:
        w = w.sortWithinPartitions(*part_cols, *order_by)
    return w


def compact_partitions(spark: SparkSession, path: str,
                       part_cols: "list[str]", target_bytes: int,
                       order_by: "list[str] | None" = None,
                       max_partitions: int = MAX_COMPACT_PARTITIONS,
                       verify: bool = False,
                       allow_nonatomic_rename: bool = False,
                       break_lease: bool = False,
                       lease_ttl_sec: float = 3600.0) -> dict:
    """Rewrite every fragmented partition of the dataset at ``path``
    into ~``target_bytes`` files (see the module docstring for the
    plan/rewrite/swap shape and the atomicity contract); returns
    ``{"compacted": [rel, ...], "files_before": n, "files_after": n,
    "max_records": m, "n_rows": r}``. ``order_by`` sorts rows within
    each rewritten partition before splitting (the OPTIMIZE ZORDER
    idiom — pass a ``zorder_key`` projection for multi-dimensional
    clustering), improving min/max pruning for later scans.
    ``verify=True`` recomputes the order-free partition fingerprints
    of the touched slice after the swap and raises if compaction
    changed ANY content — the never-changes-content invariant,
    self-checked. A flat-namespace object-store path (s3a/gs/...)
    is REFUSED unless ``allow_nonatomic_rename=True`` — there the
    swap's renames are data copies, not metadata ops (see
    :func:`_require_atomic_rename`).

    The whole run holds the single-writer maintenance lease on
    ``path`` (:func:`~fstd2pandas_spark.fsutil.maintenance_lease` —
    the enforcement of the premise earlier releases only documented:
    two concurrent runs pass each other's debris checks before either
    run's hidden dirs appear, then interleave renames). A held lease
    raises naming the owner; a HARD-KILLED run's stale lease (age >
    ``lease_ttl_sec``) is broken only under explicit
    ``break_lease=True`` (a normally-failing run releases its lease
    in a finally, so this is the kill -9 path only)."""
    fs, _root = hadoop_fs(spark, path)
    if not fs.exists(_root):
        # checked BEFORE the lease: the lock file's creation makes
        # parent dirs, which would turn a typo'd path into a silently
        # "empty dataset, nothing to compact" success
        raise ValueError(f"compact_partitions: {path} does not exist")
    _require_atomic_rename(fs, path, allow_nonatomic_rename,
                           "compact_partitions")
    with maintenance_lease(spark, path, "compact_partitions",
                           ttl_sec=lease_ttl_sec,
                           break_lease=break_lease) as lease:
        return _compact_locked(spark, path, part_cols, target_bytes,
                               order_by, max_partitions, verify, fs,
                               lease)


def _refuse_on_debris(spark: SparkSession, path: str,
                      debris: "list[str]", who: str) -> None:
    """ONE definition of the debris refusal (the _widen third-copy
    rule): extends ``debris`` (the plan walk's findings) with crashed
    rewrite temp dirs and raises if anything is present — a new run on
    top of old debris would make the crash states ambiguous."""
    debris.extend(t.getName() for t in _tmp_dirs(spark, path))
    if debris:
        raise RuntimeError(
            f"{who}: crash debris present under "
            f"{path} ({debris[:4]}) — run recover_compaction first; "
            "starting a new run on top of debris would make the crash "
            "states ambiguous")


def _compact_locked(spark: SparkSession, path: str,
                    part_cols: "list[str]", target_bytes: int,
                    order_by: "list[str] | None",
                    max_partitions: int, verify: bool, fs,
                    lease=None) -> dict:
    """The body of :func:`compact_partitions`, run under the lease."""
    debris: "list[str]" = []
    plan = compaction_plan(spark, path, part_cols, target_bytes,
                           debris_out=debris)
    _refuse_on_debris(spark, path, debris, "compaction")
    bucketed = sorted(e["rel"] for e in plan if e["bucketed"])
    if bucketed:
        raise RuntimeError(
            "compaction: bucket-id file names (part-*_NNNNN.cNNN) "
            f"under {bucketed[:4]} — this is a BUCKETED table layout; "
            "rewriting its files would silently break the "
            "bucket-to-file contract that exchange-free joins "
            "(plans/bucketing.py read_bucketed) rely on. Re-bucket "
            "through write_bucketed instead")
    touched = [e for e in plan if e["needs"]]
    stats = {"compacted": [e["rel"] for e in touched],
             "files_before": sum(e["n_files"] for e in touched),
             "files_after": 0, "max_records": 0, "n_rows": 0}
    if not touched:
        return stats
    if len(touched) > max_partitions:
        raise ValueError(
            f"compaction touches {len(touched)} partitions > "
            f"max_partitions={max_partitions} — split the job into "
            "windows (e.g. by a partition-prefix filter) instead of "
            "serializing one giant swap loop through the driver")

    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in part_cols:
        if c not in dtypes:
            raise ValueError(f"partition column {c} not in the "
                             f"dataset schema {sorted(dtypes)}")
    bad_order = [c for c in (order_by or []) if c not in dtypes]
    if bad_order:
        raise ValueError(f"order_by columns {bad_order} not in the "
                         "dataset schema")
    pruned = df.filter(_touch_filter(part_cols, dtypes, touched))
    content_cols = [c for c in df.columns if c not in part_cols]

    # --- canonical-name safety, computed BEFORE anything is renamed.
    # The swap assumes the rewrite lands each touched partition's rows
    # at tmp/<rel>, which holds only when the decoded directory values
    # ROUND-TRIP the writer's canonical string form: `x=3` on a double
    # column is rewritten as `x=3.0`, and treating the missing
    # tmp/x=3 as "zero rows" would DELETE the original. One
    # entries-sized LOCAL job computes the canonical values; two dirs
    # decoding to one canonical partition (x=3 plus x=3.0, or two
    # escapings of one value) can never swap safely and abort here.
    nv = len(part_cols)
    canon_rows = (spark.createDataFrame(
        [(e["rel"], *[v for v in e["values"]]) for e in touched],
        ", ".join(["rel string"] + [f"v{i} string" for i in range(nv)]))
        .select("rel", *[F.col(f"v{i}").cast(dtypes[c]).cast("string")
                         .alias(f"v{i}")
                         for i, c in enumerate(part_cols)])
        .collect())
    canon_by_rel = {r["rel"]: tuple(r[f"v{i}"] for i in range(nv))
                    for r in canon_rows}
    seen_canon: dict = {}
    for e in touched:
        key = canon_by_rel[e["rel"]]
        if key in seen_canon:
            raise RuntimeError(
                f"compaction: partitions {seen_canon[key]!r} and "
                f"{e['rel']!r} decode to the SAME canonical partition "
                f"values {key} — the rewrite would merge them into one "
                "directory and the swap would delete an original; "
                "normalize the layout first (nothing was modified)")
        seen_canon[key] = e["rel"]

    # per-partition row counts in canonical key space: ONE job over
    # the pruned slice. Under verify=True the fingerprints job carries
    # n_rows already, so it serves both duties (no separate count).
    if verify:
        from fstd2pandas_spark.plans.snapshot import (
            partition_fingerprints)

        def _fp_stats():
            fp = partition_fingerprints(
                spark.read.parquet(path).filter(
                    _touch_filter(part_cols, dtypes, touched)),
                part_cols, content_cols)
            return fp.select(
                *[F.col(c).cast("string").alias(f"v{i}")
                  for i, c in enumerate(part_cols)],
                "n_rows", "fp_a", "fp_b").collect()

        stat_rows = _fp_stats()
        before = {tuple(r) for r in stat_rows}
        counts = {tuple(r[f"v{i}"] for i in range(nv)): r["n_rows"]
                  for r in stat_rows}
    else:
        alias = "n"
        while alias in part_cols:
            alias += "_"
        cnt_rows = (pruned.groupBy(*part_cols)
                    .agg(F.count("*").cast("long").alias(alias))
                    .select(*[F.col(c).cast("string").alias(f"v{i}")
                              for i, c in enumerate(part_cols)],
                            alias).collect())
        counts = {tuple(r[f"v{i}"] for i in range(nv)): r[alias]
                  for r in cnt_rows}
    rows_p = {e["rel"]: counts.get(canon_by_rel[e["rel"]], 0)
              for e in touched}
    stats["n_rows"] = sum(rows_p.values())

    # convergence-safe split: max_records is the smallest cap keeping
    # EVERY partition's file count within its own n_ideal — a single
    # global bytes-per-row average would leave small-row partitions
    # over-split under row-width skew and re-flagged (and re-rewritten)
    # on every later run, never converging. Wide-row partitions may
    # overshoot the byte target instead, bounded by their n_ideal.
    max_records = max(
        [1] + [math.ceil(rows_p[e["rel"]] / e["n_ideal"])
               for e in touched if rows_p[e["rel"]] > 0])
    stats["max_records"] = max_records

    w = _rewrite_frame(pruned, part_cols, order_by)
    tmp = f"{path.rstrip('/')}.compact-{uuid.uuid4().hex[:12]}"
    (w.write.option("maxRecordsPerFile", max_records)
      .partitionBy(*part_cols).mode("overwrite").parquet(tmp))

    tmp_jp = jpath(spark, tmp)
    # --- pre-swap structural check (still nothing renamed): every
    # directory the writer produced must be a touched rel, and a
    # touched rel may be absent ONLY if it genuinely held zero rows —
    # any other shape means the writer re-canonicalized a name and a
    # blind swap would lose data. Failure here deletes tmp and leaves
    # the dataset byte-identical.
    written = (set() if not fs.exists(tmp_jp) else
               {e2["rel"] for e2 in
                _list_partitions(spark, tmp, part_cols)})
    extra = sorted(written - {e["rel"] for e in touched})
    missing_with_rows = sorted(
        e["rel"] for e in touched
        if e["rel"] not in written and rows_p[e["rel"]] > 0)
    if extra or missing_with_rows:
        delete_checked(fs, tmp_jp, what="rewrite temp dir")
        raise RuntimeError(
            "compaction: the rewrite's output directories do not "
            f"match the touched partitions (unexpected {extra[:4]}, "
            f"missing-with-rows {missing_with_rows[:4]}) — the "
            "directory names do not round-trip the writer's canonical "
            "form and a blind swap would lose data; nothing was "
            "modified (temp output removed)")

    try:
        for e in touched:
            # between partitions, not mid-partition: a swap step is
            # the atomic unit recovery can decide, so aborting at the
            # boundary leaves the cleanest possible crash state when
            # sustained heartbeat failure has aged the lease into
            # breakability (LeaseExpiredError from the handle)
            if lease is not None:
                lease.check()
            old = jpath(spark, f"{path.rstrip('/')}/{e['rel']}")
            new = jpath(spark, f"{tmp}/{e['rel']}")
            parent = old.getParent()
            # the hidden name ENCODES the original leaf so a crash
            # state is mechanically decidable (recover_compaction)
            leaf = e["rel"].rsplit("/", 1)[-1]
            hidden = jpath(spark, str(parent),
                           f".compact-old-{uuid.uuid4().hex[:12]}-{leaf}")
            if not fs.rename(old, hidden):
                raise IOError(f"compaction: rename {old} -> {hidden} "
                              "failed")
            if fs.exists(new):
                if not fs.rename(new, old):
                    # put the original back before dying — and say
                    # HONESTLY whether that worked: a false "restored"
                    # would stop the operator from running recovery
                    # while the partition is invisible
                    if fs.rename(hidden, old):
                        raise IOError(
                            f"compaction: rename {new} -> {old} "
                            "failed (original restored)")
                    raise IOError(
                        f"compaction: rename {new} -> {old} failed "
                        f"AND the restore failed — partition "
                        f"{e['rel']} is currently only under "
                        f"{hidden}; run recover_compaction")
            # a touched partition whose files held ZERO rows (verified
            # against the per-partition counts above) writes no output
            # directory: removing the empty files IS the
            # content-preserving compaction of that partition
            delete_checked(fs, hidden,
                           what="superseded pre-swap partition copy")
    finally:
        delete_checked(fs, tmp_jp, what="rewrite temp dir")

    if verify:
        after = {tuple(r) for r in _fp_stats()}
        if before != after:
            raise AssertionError(
                "compaction changed content: partition fingerprints "
                f"diverged for "
                f"{sorted(set(map(str, before ^ after)))[:4]} — the "
                "never-changes-content invariant is broken; the "
                "dataset may have been written concurrently")

    # files_after via TARGETED listings of the compacted partitions
    # only — a full re-walk of the dataset would both contradict the
    # metadata-plane cost model and turn unrelated concurrent junk
    # anywhere in the tree into a post-success exception
    base_dir = path.rstrip("/")
    n_after = 0
    for rel in stats["compacted"]:
        d = jpath(spark, f"{base_dir}/{rel}")
        if fs.exists(d):
            n_after += sum(
                1 for st in fs.listStatus(d)
                if st.isFile()
                and not _is_hidden(st.getPath().getName()))
    stats["files_after"] = n_after
    return stats


def expire_partitions(spark: SparkSession, path: str,
                      part_cols: "list[str]", predicate,
                      max_partitions: int = MAX_COMPACT_PARTITIONS,
                      allow_nonatomic_rename: bool = False,
                      break_lease: bool = False,
                      lease_ttl_sec: float = 3600.0) -> dict:
    """Delete WHOLE partitions whose decoded values match
    ``predicate`` — the retention/TTL/GDPR-expiry primitive (Delta's
    partition-boundary ``DELETE WHERE`` / Iceberg's
    ``expire``+``remove_orphan_files`` use case) as a pure
    METADATA-plane op: one plan walk lists the partitions, NO data is
    ever read or rewritten, and the job cost is independent of the
    table's byte size — exactly what dropping yesterday's raw tier
    from a 100 TB hive layout must cost.

    ``predicate`` is a driver-side callable ``dict -> bool`` over
    ``{col: value}`` with values in the directory's decoded STRING
    form (``None`` for the hive NULL partition) — cast inside the
    predicate; ISO dates compare correctly as strings. Each matching
    partition disappears ATOMICALLY via the compaction swap's rename
    protocol: rename to a hidden ``.compact-exp-<12hex>-<leaf>``
    sibling (readers see the partition entirely or not at all — a
    direct recursive delete would expose PARTIAL data to concurrent
    scans mid-delete and after a crash), then delete the condemned
    copy. The rename IS the commit: a crash between the two steps
    leaves only hidden debris that :func:`recover_compaction` always
    DELETES (never restores — that would resurrect data the caller
    asked removed) and that :func:`compact_partitions` /
    :func:`expire_partitions` refuse to start on. Returns
    ``{"expired": [rel, ...], "files_removed": n,
    "bytes_removed": n}``.

    Same operational contract as compaction: the whole run holds the
    single-writer maintenance lease, and flat-namespace object-store
    schemes are refused unless ``allow_nonatomic_rename=True``. Under
    that opt-in the all-or-nothing claim is VOID there: the rename is
    a per-object copy + delete, so a mid-copy crash leaves a
    HALF-expired partition whose live remainder reads as normal data,
    and recovery deletes only the hidden half — re-run
    expire_partitions with the same predicate to finish the job."""
    if not part_cols:
        raise ValueError("need at least one partition column")
    fs, root = hadoop_fs(spark, path)
    if not fs.exists(root):
        raise ValueError(f"expire_partitions: {path} does not exist")
    _require_atomic_rename(fs, path, allow_nonatomic_rename,
                           "expire_partitions")
    with maintenance_lease(spark, path, "expire_partitions",
                           ttl_sec=lease_ttl_sec,
                           break_lease=break_lease) as lease:
        debris: "list[str]" = []
        entries = _list_partitions(spark, path, part_cols, debris)
        _refuse_on_debris(spark, path, debris, "expire_partitions")
        doomed = [e for e in entries
                  if predicate(dict(zip(part_cols, e["values"])))]
        if len(doomed) > max_partitions:
            raise ValueError(
                f"expiry matches {len(doomed)} partitions > "
                f"max_partitions={max_partitions} — split the job "
                "into windows instead of serializing one giant "
                "driver loop")
        stats = {"expired": [e["rel"] for e in doomed],
                 "files_removed": sum(e["n_files"] for e in doomed),
                 "bytes_removed": sum(e["bytes"] for e in doomed)}
        base_dir = path.rstrip("/")
        for e in doomed:
            # same boundary-abort as the compaction swap loop: an
            # expiry step is recovery-decidable on its own, so stop
            # between partitions once the lease no longer protects us
            lease.check()
            old = jpath(spark, f"{base_dir}/{e['rel']}")
            leaf = e["rel"].rsplit("/", 1)[-1]
            hidden = jpath(
                spark, str(old.getParent()),
                f"{_EXP_PREFIX}{uuid.uuid4().hex[:12]}-{leaf}")
            if not fs.rename(old, hidden):
                raise IOError(
                    f"expire_partitions: rename {old} -> {hidden} "
                    "failed — this partition is NOT expired; already-"
                    "renamed partitions are; re-run after fixing the "
                    "filesystem error")
            delete_checked(fs, hidden, what="expired partition copy")
        return stats


def _tmp_dirs(spark: SparkSession, path: str):
    """Crashed rewrite temp dirs: root SIBLINGS matching the exact
    ``<base>.compact-<12 hex>`` format the rewrite writes — one
    non-recursive listing; look-alike names (a user's
    ``table.compact-backup``) are not ours and are never touched."""
    fs, root = hadoop_fs(spark, path)
    parent = root.getParent()
    if parent is None:
        # Path('file:///').getParent() is null — listStatus(None)
        # would die as an opaque Py4J NPE deep in the JVM
        raise ValueError(
            f"compaction: dataset path {path!r} is a filesystem/bucket "
            "root — temp-dir siblings (and the rewrite's own "
            "<base>.compact-* temp output) cannot exist there; place "
            "the dataset in a directory")
    base = root.getName()
    pat = re.compile(re.escape(base) + _TMP_SUFFIX_RE)
    out = []
    for st in fs.listStatus(parent):
        name = st.getPath().getName()
        if st.isDirectory() and pat.fullmatch(name):
            out.append(st.getPath())
    return out


def _hidden_dirs(spark: SparkSession, path: str,
                 part_cols: "list[str]"):
    """``(jpath, parent_rel)`` for every ``.compact-old-*`` /
    ``.compact-exp-*`` dir at any partition-parent level — the
    recovery-side walk (the hot path, compact_partitions, piggybacks
    on its plan walk instead)."""
    fs, root = hadoop_fs(spark, path)
    hiddens = []

    def walk(jdir, rel: str, depth: int):
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            if name.startswith((_HIDDEN_PREFIX, _EXP_PREFIX)):
                hiddens.append((st.getPath(), rel))
            elif not _is_hidden(name) and depth + 1 < len(part_cols):
                walk(st.getPath(), f"{rel}/{name}" if rel else name,
                     depth + 1)

    walk(root, "", 0)
    return hiddens


def recover_compaction(spark: SparkSession, path: str,
                       part_cols: "list[str]",
                       allow_nonatomic_rename: bool = False,
                       break_lease: bool = False,
                       lease_ttl_sec: float = 3600.0) -> dict:
    """Repair the debris a crashed :func:`compact_partitions` or
    :func:`expire_partitions` run can leave behind; returns
    ``{"restored": [rel, ...], "stale_removed": n, "tmp_removed": n,
    "expired_removed": n}``. Safe to run anytime no maintenance run
    is ACTIVE on ``path`` — enforced by the shared lease; a clean
    dataset is a no-op.

    Every crash state is decidable because the hidden name encodes the
    original leaf (``.compact-old-<hex>-<leaf>`` /
    ``.compact-exp-<hex>-<leaf>``):

    - ``.compact-exp-*`` dir (a crashed expiry) — ALWAYS deleted,
      never restored: the rename was the expiry's commit point, and
      restoring would resurrect data the caller asked removed;

    - hidden dir whose sibling ``<leaf>`` is MISSING — the crash hit
      between the two swap renames; the hidden dir IS the original
      partition: rename it back (content fully restored);
    - hidden dir whose sibling ``<leaf>`` EXISTS — the crash hit after
      the new directory was swapped in but before cleanup; the hidden
      dir is the superseded pre-compaction copy (same content, old
      layout): delete it;
    - ``<path>.compact-*`` rewrite temp dirs — output of a crashed
      run; every original is in place or restored above, so the temp
      content is redundant: delete LAST (after restores, so a crash
      during recovery itself never reduces the number of copies).

    The pre-flight debris check in :func:`compact_partitions` is what
    makes this exhaustive: a new run never starts on top of old
    debris, so at most one crashed run's state is ever on disk.
    ``allow_nonatomic_rename`` mirrors :func:`compact_partitions` —
    debris on an object store can only exist if a run was forced
    there, and its recovery renames are copies too.

    Recovery holds the same single-writer lease as compaction — "no
    compaction is ACTIVE" is now enforced, not assumed. The usual
    crash that NEEDS recovery is a hard kill, which also leaves the
    crashed run's lease behind: pass ``break_lease=True`` (once the
    lease is older than ``lease_ttl_sec``) to take it over along with
    the debris."""
    fs, root = hadoop_fs(spark, path)
    if not fs.exists(root):
        raise ValueError(f"recover_compaction: {path} does not exist")
    _require_atomic_rename(fs, path, allow_nonatomic_rename,
                           "recover_compaction")
    with maintenance_lease(spark, path, "recover_compaction",
                           ttl_sec=lease_ttl_sec,
                           break_lease=break_lease):
        return _recover_locked(spark, path, part_cols, fs)


def _recover_locked(spark: SparkSession, path: str,
                    part_cols: "list[str]", fs) -> dict:
    """The body of :func:`recover_compaction`, run under the lease."""
    stats = {"restored": [], "stale_removed": 0, "tmp_removed": 0,
             "expired_removed": 0}
    for h, parent_rel in _hidden_dirs(spark, path, part_cols):
        name = h.getName()
        prefix = (_EXP_PREFIX if name.startswith(_EXP_PREFIX)
                  else _HIDDEN_PREFIX)
        tail = name[len(prefix):]
        parts = tail.split("-", 1)
        # the hex token is the SIGNATURE (the exact-format rule the
        # tmp sweep already follows): `.compact-old-my-backup` would
        # otherwise decode as hex='my', leaf='backup' and get renamed
        # or deleted — a user's look-alike dir destroyed
        if len(parts) != 2 or not parts[1] or \
                not re.fullmatch(r"[0-9a-f]{12}", parts[0]):
            # the manual advice DIFFERS by prefix: an undecodable
            # .compact-exp-* dir holds data the caller asked REMOVED
            # — telling the operator to 'rename it back' would be a
            # retention/GDPR violation, not a recovery
            advice = (
                "verify it holds only data that was meant to be "
                "expired and delete it manually — NEVER rename it "
                "back (that would resurrect removed data)"
                if prefix == _EXP_PREFIX else
                "identify the partition from the dir's parquet "
                "content and rename it back (or delete it if its "
                "partition exists) manually")
            raise ValueError(
                f"recover_compaction: cannot decode {h} — the "
                f"pre-recovery release named hidden dirs "
                f"{prefix}<hex> without the original leaf, and "
                f"other tools may collide with the prefix; {advice} "
                "— refusing to guess")
        if prefix == _EXP_PREFIX:
            # a condemned expired partition is ALWAYS deleted, never
            # restored: the rename was the expiry's commit point, and
            # restoring would resurrect data the caller asked removed
            if delete_checked(fs, h,
                              what="condemned expired partition"):
                stats["expired_removed"] += 1
            continue
        leaf = parts[1]
        target = jpath(spark, str(h.getParent()), leaf)
        rel = f"{parent_rel}/{leaf}" if parent_rel else leaf
        if fs.exists(target):
            # counted only when the delete actually happened — a
            # False return (path still present) must not report a
            # clean table the next run then refuses on
            if delete_checked(fs, h,
                              what="superseded pre-swap partition "
                                   "copy"):
                stats["stale_removed"] += 1
        else:
            if not fs.rename(h, target):
                raise IOError(
                    f"recover_compaction: rename {h} -> {target} "
                    "failed")
            stats["restored"].append(rel)
    for t in _tmp_dirs(spark, path):
        if delete_checked(fs, t, what="rewrite temp dir"):
            stats["tmp_removed"] += 1
    return stats
