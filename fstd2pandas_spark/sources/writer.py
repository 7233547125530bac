"""High-level record-table writer — the three modes of
``StandardFileWriter`` (SURVEY §2.1 S9-S10; std_writer.py:30-168) on the
``fstrec`` data source:

- ``write``: metadata_cleanup -> sequential-I/O ordering (path, key) ->
  distributed write (std_writer.py:127-155; O7's sort discipline via
  ``sortWithinPartitions``);
- ``dump``: raw write, no cleanup (std_writer.py:90-98);
- ``update``: metadata-only in-place edit of existing container files by
  (path, key) — never rewrites payload bytes (std_writer.py:100-125).

``detect_rewrite`` is S10 (std_writer.py:158-168): flags duplicate
(nomvar, typvar, etiket, ip1, ip2, ip3) groups so callers choose
append-vs-rewrite before committing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: S10 duplicate-detection key (std_writer.py:163)
REWRITE_KEYS = ["nomvar", "typvar", "etiket", "ip1", "ip2", "ip3"]

UPDATABLE = ["nomvar", "typvar", "etiket", "grtyp", "dateo", "ip1", "ip2",
             "ip3", "deet", "npas", "datyp", "nbits", "ig1", "ig2", "ig3",
             "ig4", "datev"]


class WriterError(Exception):
    pass


def detect_rewrite(df: DataFrame) -> bool:
    """True when the table holds duplicate logical records (S10): the
    write must rewrite instead of append."""
    return bool(
        df.groupBy(*REWRITE_KEYS).count().filter(F.col("count") > 1)
        .limit(1).count()
    )


def write_record_table(df: DataFrame, path: str, mode: str = "write",
                       no_meta: bool = False,
                       overwrite: bool = False,
                       partition_by: "list[str] | None" = None,
                       container: str = "fstrec",
                       update_driver_threshold: int = 10_000) -> None:
    """Write a record table to a directory of record containers.

    ``container="fstrec"`` emits the portable container;
    ``container="xdf"`` emits real FST/XDF binary files (librmn layout,
    readable by ECCC tools for the transparent datyps — see
    :mod:`~fstd2pandas_spark.sources.xdf_format`).

    ``partition_by`` (e.g. ``["datev", "grid"]`` — the 100 TB layout from
    SURVEY §7.2) clusters records so each output file holds one key
    group: readers of a (date, grid) slice then touch one file instead
    of all of them, the file-level pruning analog of partition pruning.
    """
    from fstd2pandas_spark.operators.metadata import metadata_cleanup
    from fstd2pandas_spark.schema import META_NOMVARS

    if mode == "update":
        _update(df, driver_threshold=update_driver_threshold)
        return
    if no_meta:
        # NULL nomvar is a data row, not meta (the select.py rule)
        df = df.filter(~F.col("nomvar").isin(META_NOMVARS)
                       | F.col("nomvar").isNull())
    if mode == "write":
        df = metadata_cleanup(df)
    if partition_by:
        # cluster after cleanup so the union with surviving meta rows
        # does not scatter the groups again
        df = df.repartition(*[F.col(c) for c in partition_by])
    if mode == "write":
        order = [c for c in ("path", "key") if c in df.columns]
        if order:
            df = df.sortWithinPartitions(*order)
    elif mode != "dump":
        raise WriterError(f"unknown mode {mode!r}; use write|dump|update")
    writer = df.write.format("fstrec").option("container", container)
    # Python DataSource writers support only Append/Overwrite — the
    # default ErrorIfExists mode raises UNSUPPORTED_DATA_SOURCE_SAVE_MODE
    # even on a fresh path, so non-overwrite writes must use append mode.
    # ErrorIfExists semantics are restored driver-side: an existing
    # non-empty target errors instead of silently accumulating duplicate
    # records across re-runs.
    if not overwrite:
        if _target_has_data(df, path):
            raise WriterError(
                f"target {path!r} already holds data; pass overwrite=True "
                "to replace it")
    writer = writer.mode("overwrite" if overwrite else "append")
    writer.save(path)


def _target_has_data(df: DataFrame, path: str) -> bool:
    """Existing-target probe behind the restored ErrorIfExists guard.
    os.path alone would silently no-op for hdfs://-style URIs, so any
    path with a scheme goes through the JVM Hadoop FileSystem (the same
    resolution the write itself uses). Scheme detection matches the
    URI grammar, not a literal '://': Hadoop accepts SINGLE-slash
    forms like ``file:/data/tbl``, and sending those down the os.path
    branch would return False on an existing table — silently
    disabling the duplicate-accumulation guard. The colon must be
    followed by '/' (every hierarchical URI is) so a legal relative
    directory like ``out:v2/tbl`` or a Windows ``C:\\data`` spelling
    still takes the local branch instead of crashing in
    ``getFileSystem`` on a bogus scheme — and the scheme needs TWO+
    characters, because a single letter before ':/' is a Windows
    drive path in its forward-slash spelling (``C:/data``), which
    Hadoop would reject as 'No FileSystem for scheme: C' (no real
    Hadoop filesystem scheme is one letter)."""
    import os
    import re

    if re.match(r"[A-Za-z][A-Za-z0-9+.-]+:/", path) is None:
        return os.path.isdir(path) and any(
            not e.startswith(("_", ".")) for e in os.listdir(path))
    from fstd2pandas_spark.fsutil import hadoop_fs

    fs, hpath = hadoop_fs(df.sparkSession, path)
    if not fs.exists(hpath):
        return False
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            return True
    return False


def _group_updates(rows, cols) -> "dict[str, dict[int, dict]]":
    by_path: dict[str, dict[int, dict]] = {}
    for r in rows:
        by_path.setdefault(r.path, {})[int(r.key)] = {
            c: r[c] for c in cols if r[c] is not None
        }
    return by_path


def _update(df: DataFrame, driver_threshold: int = 10_000) -> None:
    """Metadata-only in-place edit: every row must carry (path, key)
    pointing at an existing container record; payload bytes are never
    rewritten (reference std_writer.py:100-125 ``fst_edit_dir``).

    Small edit sets (<= ``driver_threshold`` rows) are applied
    driver-side in one loop — header pages are KBs and job-scheduling
    overhead would dominate. Larger sets go through
    ``repartition("path").foreachPartition``: every file's edits land in
    exactly one task (no two tasks touch the same file), so a
    billion-record metadata edit never pins the driver. The scale path
    assumes executors see the container files (shared FS / object store
    — the same premise as any in-place edit)."""
    from fstd2pandas_spark.sources.fstrec_format import (
        maybe_fstrec, update_metadata)

    cols = [c for c in UPDATABLE if c in df.columns]
    if "path" not in df.columns or "key" not in df.columns:
        raise WriterError("update mode needs path and key columns")
    sel = df.select("path", "key", *cols)

    def _check_paths(paths) -> None:
        # the data source also READS real FST/XDF files, but in-place
        # update is implemented for the fstrec layout only — fail fast
        # on every target BEFORE any file is edited, not midway
        bad = sorted(p for p in paths if not maybe_fstrec(p))
        if bad:
            raise WriterError(
                f"update mode supports fstrec containers only; not "
                f"fstrec: {bad[:3]}{'...' if len(bad) > 3 else ''}")

    if driver_threshold > 0:
        head = sel.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            grouped = _group_updates(head, cols)
            _check_paths(grouped)
            for p, updates in grouped.items():
                update_metadata(p, updates)
            return
    _check_paths(r.path for r in sel.select("path").distinct().collect())

    def _apply(part) -> None:
        from fstd2pandas_spark.sources.fstrec_format import update_metadata

        for p, updates in _group_updates(part, cols).items():
            update_metadata(p, updates)

    sel.repartition("path").foreachPartition(_apply)
