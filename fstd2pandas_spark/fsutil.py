"""One definition of the JVM Hadoop-FileSystem resolution (the
_resolve_latest one-definition convention): compaction, the streaming
CDC sink and the writer all talk to the metadata plane through this.

Paths returned to Spark readers must stay FULLY QUALIFIED
(``str(jpath)`` keeps scheme + authority): ``toUri().getPath()``
strips them, and a stripped ``s3a://bucket/serving/gen-...`` would
silently resolve against the cluster's default filesystem — a
different table at worst, a path-not-found at best.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

_log = logging.getLogger(__name__)


def hadoop_fs(spark: SparkSession, path: str):
    """``(FileSystem, Path)`` for ``path`` on ITS OWN filesystem (the
    scheme/authority in the path wins over ``fs.defaultFS``)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def jpath(spark: SparkSession, *parts: str):
    """A Hadoop ``Path`` from parts (no filesystem resolution)."""
    return spark._jvm.org.apache.hadoop.fs.Path(*parts)


#: lease-file name, shared by every maintenance-plane writer on a
#: dataset/table root (dot-prefixed: parquet readers and the
#: compaction plan walk both skip hidden names)
LEASE_FILE = ".maintenance-lock"

#: filesystems whose namespace is FLAT (object stores): rename is a
#: server-side copy + delete, and create-exclusive is a best-effort
#: HEAD-then-PUT. Compaction REFUSES these for its rename-based swap
#: (plans/compaction.py); the lease only WARNS — the CDC sink's
#: generation protocol is rename-free by design and works there, but
#: its lease is advisory, not watertight. abfs/abfss are absent:
#: ADLS Gen2's hierarchical namespace has real atomic renames.
#: Necessarily incomplete — any vendor can register a new scheme.
FLAT_NAMESPACE_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "oss", "wasb", "wasbs", "swift",
     "cos", "cosn", "obs"})


def fs_scheme(fs) -> "str | None":
    """The resolved filesystem's URI scheme (seam for tests — a real
    s3a filesystem cannot be registered in a local JVM cheaply)."""
    return fs.getUri().getScheme()


class LeaseHeldError(RuntimeError):
    """Another maintenance run holds the single-writer lease."""


#: (root, scheme) pairs whose flat-namespace advisory warning already
#: fired this process — the lease is acquired per micro-batch by the
#: CDC sink, and the honesty warning must not flood a continuous
#: stream's driver log
_flat_warned: "set[tuple[str, str]]" = set()


def _read_lease(spark: SparkSession, fs, lock):
    """Best-effort ``(payload, age_sec)`` of an existing lease file.
    AGE comes from the filesystem's modification time (robust against
    torn/unreadable content — a breaker must never be blocked by a
    corrupt lock); payload is the informational owner record, ``{}``
    when unreadable, ``(None, None)`` when the file vanished."""
    import json
    import time

    try:
        st = fs.getFileStatus(lock)
    except Exception:
        return None, None
    age = max(0.0, time.time() - st.getModificationTime() / 1000.0)
    try:
        stream = fs.open(lock)
        try:
            txt = spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
        finally:
            stream.close()
        return json.loads(txt), age
    except Exception:
        return {}, age


def maintenance_lease(spark: SparkSession, root: str, who: str,
                      ttl_sec: float = 3600.0,
                      break_lease: bool = False):
    """Single-writer lease on a dataset/table root — the enforcement
    of the premise compaction, recovery and the CDC sink previously
    only DOCUMENTED: two concurrent ``compact_partitions`` runs pass
    each other's pre-flight debris checks before either's hidden dirs
    appear and then interleave renames; two CDC sinks allocate the
    same generation. Use as a context manager::

        with maintenance_lease(spark, path, "compact_partitions"):
            ...  # the critical section

    Acquisition is create-exclusive: ``os.open(O_CREAT|O_EXCL)`` on
    the local scheme (Hadoop's RawLocalFileSystem ``create(overwrite=
    false)`` is a NON-atomic exists-check + open — two simultaneous
    creates both succeed, one truncating the other),
    ``FileSystem.create(lock, overwrite=false)`` elsewhere (atomic on
    HDFS; best-effort on a flat-namespace object store — those paths
    are already behind ``allow_nonatomic_rename``). The lock file
    carries ``{owner, host, pid, ts, token}`` so a refusal NAMES the
    holder.

    A held lease raises :class:`LeaseHeldError`. A STALE lease (age >
    ``ttl_sec`` by the filesystem's own modification time — immune to
    torn content) is broken only under explicit ``break_lease=True``,
    never automatically: staleness is a heuristic, and the caller is
    asserting the holder is dead. Breaking a FRESH lease is refused
    even with the flag — that would stomp a live writer. The break
    itself is an atomic RENAME of the stale lock to a breaker-unique
    name: of N concurrent breakers exactly one rename succeeds, so a
    breaker can never delete a RIVAL breaker's freshly-created lock
    (the delete-then-create race). While held, a daemon heartbeat
    refreshes the lock's mtime every ``ttl_sec / 4`` so a LIVE run
    longer than ``ttl_sec`` never reads as stale. Release deletes
    only OUR token's file: a lock that reads as a different token is
    left behind with a WARNING that two runs may have interleaved; a
    lock that exists but cannot be READ (transient I/O) is also left
    behind — deleting a possible rival's lock risks the concurrency
    the lease exists to prevent — with a warning telling the operator
    how to clear it if it turns out to be ours.

    Clock domains: staleness compares the READER's ``time.time()``
    against the filesystem's stamped mtime (creation stamp is the
    server's on HDFS, the holder's client clock after the first
    heartbeat). Host/server clock skew therefore eats into the ttl
    margin — size ``ttl_sec`` well above the fleet's worst skew
    (``ttl_sec < 5`` is refused outright: the heartbeat interval
    ``max(1s, ttl/4)`` must stay clearly inside the ttl). On a
    flat-namespace object store, create-exclusive itself is a
    best-effort HEAD-then-PUT — the lease WARNS there and becomes
    advisory; compaction's rename swap separately refuses those
    schemes."""
    import contextlib
    import json
    import os
    import socket
    import threading
    import time
    import uuid

    if ttl_sec < 5:
        raise ValueError(
            f"ttl_sec={ttl_sec!r} — below 5s the heartbeat interval "
            "max(1s, ttl/4) no longer stays clearly inside the ttl, "
            "so a LIVE lease would periodically age into breakability "
            "between beats")
    fs, _r = hadoop_fs(spark, root)
    base = root.rstrip("/")
    lock = jpath(spark, f"{base}/{LEASE_FILE}")
    token = uuid.uuid4().hex
    payload = json.dumps({
        "owner": who, "host": socket.gethostname(),
        "pid": os.getpid(), "ts": time.time(), "token": token})
    scheme = (fs_scheme(fs) or "file").lower()
    local = scheme == "file"
    if scheme in FLAT_NAMESPACE_SCHEMES and \
            (root, scheme) not in _flat_warned:
        # once per (root, scheme): the CDC sink acquires the lease
        # per micro-batch, and a continuous object-store stream would
        # otherwise re-log this every few seconds forever
        _flat_warned.add((root, scheme))
        _log.warning(
            "maintenance lease on %s: %r is a flat-namespace object "
            "store where create-exclusive is a best-effort "
            "HEAD-then-PUT — the lease reduces but cannot ELIMINATE "
            "the concurrent-writer window; coordinate writers "
            "externally (or use a transaction-log table format)",
            root, scheme)

    def _try_create() -> bool:
        if local:
            p = lock.toUri().getPath()
            os.makedirs(os.path.dirname(p), exist_ok=True)
            try:
                fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            try:
                os.write(fd, payload.encode("utf-8"))
            finally:
                os.close(fd)
            return True
        try:
            out = fs.create(lock, False)
        except Exception as e:
            # held-lease detection must match the CONTENTION failure
            # only: 'The specified bucket does not exist' contains
            # 'exist' too, and misclassifying it sends the operator
            # chasing a phantom concurrent run instead of the typo
            msg = str(e)
            if "FileAlreadyExistsException" in msg or \
                    "already exists" in msg.lower():
                return False
            raise
        try:
            out.write(bytearray(payload.encode("utf-8")))
        finally:
            out.close()
        return True

    def _break_stale(expected_token, _observed_age) -> bool:
        """Rename-first takeover with an identity check: rename is by
        PATH, so a slow second breaker could otherwise rename the
        FIRST breaker's freshly re-created lock (the TOCTOU one step
        after the delete-then-create race). After winning the rename,
        verify the renamed file IS the stale incarnation we judged —
        same token, or (unreadable stale lock) still stale by its own
        mtime; a fresh rival's lock is renamed BACK and the takeover
        lost."""
        broken = jpath(spark, f"{base}/{LEASE_FILE}.broken-{token}")
        try:
            ok = fs.rename(lock, broken)
        except Exception:
            ok = False
        if not ok:
            return False
        b_info, b_age = _read_lease(spark, fs, broken)
        same_stale = b_info is not None and (
            (expected_token is not None
             and b_info.get("token") == expected_token)
            or (expected_token is None
                and b_age is not None and b_age > ttl_sec))
        if not same_stale:
            try:
                restored = fs.rename(broken, lock)
            except Exception:
                restored = False
            if not restored:
                _log.warning(
                    "lease takeover on %s renamed a lock that was "
                    "NOT the stale one and could not put it back — "
                    "the rightful holder's lock is at %s; restore it "
                    "manually", root, broken)
            return False
        delete_checked(fs, broken,
                       what="broken stale maintenance lease")
        return True

    @contextlib.contextmanager
    def _ctx():
        if not _try_create():
            info, age = _read_lease(spark, fs, lock)
            if info is None:
                # vanished between the create and the read — the
                # holder released; one clean retry
                if not _try_create():
                    raise LeaseHeldError(
                        f"{who}: lease on {root} is contended (it "
                        "vanished and immediately re-appeared); "
                        "retry later")
            else:
                owner = info.get("owner", "<unreadable>")
                host = info.get("host", "?")
                pid = info.get("pid", "?")
                stale = age is not None and age > ttl_sec
                if not (break_lease and stale):
                    hint = (
                        "it is STALE (age > ttl_sec); pass "
                        "break_lease=True if the holder is known dead"
                        if stale else
                        "it is FRESH — wait for the holder "
                        "(break_lease only breaks leases older than "
                        "ttl_sec)")
                    raise LeaseHeldError(
                        f"{who}: {root} is locked by {owner} "
                        f"(host={host}, pid={pid}, age={age:.0f}s, "
                        f"ttl={ttl_sec:.0f}s) — a concurrent "
                        f"maintenance run owns this table; {hint}")
                if not _break_stale(info.get("token"), age) \
                        or not _try_create():
                    raise LeaseHeldError(
                        f"{who}: lost the lease takeover race on "
                        f"{root} — another breaker got there first; "
                        "retry later")
        # heartbeat: a LIVE holder must never age into breakability —
        # a >ttl compaction broken mid-swap by recovery automation is
        # exactly the interleaving the lease prevents
        stop = threading.Event()

        def _beat():
            while not stop.wait(max(1.0, ttl_sec / 4)):
                try:
                    fs.setTimes(lock, int(time.time() * 1000), -1)
                except Exception as e:
                    _log.warning(
                        "maintenance-lease heartbeat on %s failed: "
                        "%s — the lease may age into breakability",
                        root, e)

        beat = threading.Thread(target=_beat, daemon=True,
                                name="maintenance-lease-heartbeat")
        beat.start()
        try:
            yield
        finally:
            stop.set()
            beat.join(timeout=5)
            cur = None
            for _ in range(3):
                cur, _age = _read_lease(spark, fs, lock)
                if cur is None or cur.get("token"):
                    break  # gone, or readable with a token
                time.sleep(0.2)
            if cur is None:
                _log.warning(
                    "maintenance lease on %s vanished mid-run — a "
                    "concurrent breaker may have run; check for "
                    "interleaved writes", root)
            elif cur.get("token") == token:
                delete_checked(fs, lock, what="maintenance lease")
            elif not cur.get("token"):
                _log.warning(
                    "maintenance lease on %s exists but could not be "
                    "READ to verify ownership — leaving it (deleting "
                    "a possible rival's lock risks concurrent "
                    "writers); if no other maintenance run is "
                    "active, it is this run's and can be deleted "
                    "manually or broken with break_lease=True once "
                    "stale", root)
            else:
                _log.warning(
                    "maintenance lease on %s was REPLACED mid-run "
                    "(now held by %r) — leaving it; two maintenance "
                    "runs may have interleaved",
                    root, cur.get("owner"))

    return _ctx()


def delete_checked(fs, jp, recursive: bool = True,
                   what: str = "path") -> bool:
    """``fs.delete`` signals failure by RETURNING False, not raising —
    a silently ignored False leaves debris behind (a hidden
    ``.compact-old-*`` dir, a stale generation) that the NEXT
    maintenance run refuses on, costing the operator a confused
    round-trip. Deleting an already-absent path is the benign False
    (nothing to do); a path that is still there afterwards is the real
    one and gets a WARNING naming it — it is debris, not corruption
    (recovery reclassifies and retries it), so warn-don't-raise."""
    if fs.delete(jp, recursive):
        return True
    if not fs.exists(jp):
        return True
    _log.warning(
        "delete of %s %s returned False and the path still exists — "
        "left behind as debris; the next maintenance run (or "
        "recover_compaction / vacuum_generations) will retry it",
        what, jp)
    return False
