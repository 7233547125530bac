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


class LeaseExpiredError(RuntimeError):
    """The held lease aged into breakability mid-run (sustained
    heartbeat failure): raised by :meth:`LeaseHandle.check` so a
    critical section stops BEFORE interleaving with a breaker."""


class LeaseHandle:
    """Yielded by :func:`maintenance_lease`: lets the critical section
    ask whether its lease is still protecting it. ``check()`` between
    mutating steps (the compaction swap loop calls it per partition)
    raises :class:`LeaseExpiredError` once sustained heartbeat failure
    means the lock's mtime age MUST exceed ``ttl_sec`` — from that
    moment a concurrent breaker could legitimately take the lease, and
    continuing to rename/delete is exactly the interleaving the lease
    exists to prevent."""

    def __init__(self, root: str, ttl_sec: float):
        import threading

        self._root = root
        self._ttl = ttl_sec
        self._expired = threading.Event()

    def expired(self) -> bool:
        """True once the lease has aged into breakability."""
        return self._expired.is_set()

    def check(self) -> None:
        """Raise :class:`LeaseExpiredError` if :meth:`expired`."""
        if self._expired.is_set():
            raise LeaseExpiredError(
                f"maintenance lease on {self._root} has aged into "
                f"breakability (no successful heartbeat for more than "
                f"ttl_sec={self._ttl:.0f}s) — a concurrent breaker "
                "could now own this table; aborting before further "
                "mutations can interleave. Verify the filesystem, "
                "then run recover_compaction if this left debris")


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
    longer than ``ttl_sec`` never reads as stale; SUSTAINED heartbeat
    failure (no successful beat for ``ttl_sec`` — the lock's mtime age
    now exceeds the ttl, so a breaker could legitimately take it)
    escalates to an ERROR log and flips the yielded
    :class:`LeaseHandle` to expired — long critical sections call
    ``handle.check()`` between mutating steps (the compaction swap
    loop does, per partition) and abort with
    :class:`LeaseExpiredError` instead of mutating on under a lease
    that no longer protects them. Release mirrors the takeover's
    rename-FIRST discipline: the lock is renamed to a release-unique
    name, verified to carry OUR token, then deleted — so a breaker
    that takes over between a read and a delete can never lose its
    fresh lock to our release (a claimed rival/unreadable lock is
    renamed back and left, with a WARNING that two runs may have
    interleaved).

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
            # only. Primary signal: the Java exception CLASS (walking
            # the cause chain — py4j wraps, and HDFS RemoteException
            # carries the real class inside). Fallback: the 'already
            # exists' wording, but only when the message names the
            # LOCK path itself — 'parent path ... already exists as a
            # file' or an object-store 409 about another path is a
            # real filesystem problem, and misclassifying it sends the
            # operator chasing a phantom concurrent run
            names = []
            jexc = getattr(e, "java_exception", None)
            seen = 0
            while jexc is not None and seen < 8:
                try:
                    cls = jexc.getClass().getName()
                    names.append(cls)
                    if cls.endswith("RemoteException"):
                        # HDFS IPC carries the server-side class as a
                        # STRING, not as a cause
                        names.append(jexc.getClassName())
                    jexc = jexc.getCause()
                except Exception:
                    break
                seen += 1
            msg = str(e)
            contention = any(
                n.endswith("FileAlreadyExistsException") for n in names
            ) or ("already exists" in msg.lower()
                  and (str(lock) in msg
                       or lock.toUri().getPath() in msg))
            if contention:
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
        # exactly the interleaving the lease prevents. Sustained
        # failure ESCALATES: once no beat has landed for ttl_sec, the
        # lock's mtime age must exceed the ttl and a breaker could
        # legitimately take it — warn-only would leave the critical
        # section mutating under a lease that no longer protects it,
        # so the handle flips to expired (LeaseExpiredError from
        # check()) and the log escalates to ERROR
        stop = threading.Event()
        handle = LeaseHandle(root, ttl_sec)
        last_ok = [time.time()]  # the create itself stamped the mtime

        def _beat():
            while not stop.wait(max(1.0, ttl_sec / 4)):
                try:
                    fs.setTimes(lock, int(time.time() * 1000), -1)
                    last_ok[0] = time.time()
                except Exception as e:
                    starved = time.time() - last_ok[0]
                    if starved > ttl_sec:
                        if not handle.expired():
                            handle._expired.set()
                            _log.error(
                                "maintenance-lease heartbeat on %s "
                                "has failed for %.0fs > ttl_sec=%.0fs "
                                "— the lease HAS aged into "
                                "breakability; the critical section "
                                "will abort at its next check() "
                                "(last error: %s)",
                                root, starved, ttl_sec, e)
                    else:
                        _log.warning(
                            "maintenance-lease heartbeat on %s "
                            "failed: %s — the lease ages into "
                            "breakability after %.0fs more of this",
                            root, e, ttl_sec - starved)

        beat = threading.Thread(target=_beat, daemon=True,
                                name="maintenance-lease-heartbeat")
        beat.start()
        try:
            yield handle
        finally:
            stop.set()
            beat.join(timeout=5)
            _release(handle)

    def _release(handle) -> None:
        """Rename-FIRST release, mirroring the takeover's discipline:
        read-verify-delete has a window — if the heartbeat failed long
        enough for the lease to go stale and a breaker takes over
        between our read and our delete, the delete removes the
        BREAKER's fresh lock. Renaming the lock to a release-unique
        name first makes the claim atomic: whatever we renamed is
        OURS to inspect, and a rival's lock that lost its path this
        way is put BACK."""
        rel = jpath(spark, f"{base}/{LEASE_FILE}.release-{token}")
        try:
            ok = fs.rename(lock, rel)
        except Exception:
            ok = False
        if not ok:
            if handle.expired():
                _log.error(
                    "maintenance lease on %s could not be claimed at "
                    "release after the heartbeat outage — a breaker "
                    "has likely taken over; CHECK FOR INTERLEAVED "
                    "WRITES (recover_compaction verifies the table)",
                    root)
            else:
                _log.warning(
                    "maintenance lease on %s vanished mid-run — a "
                    "concurrent breaker may have run; check for "
                    "interleaved writes", root)
            return
        cur = None
        for _ in range(3):
            cur, _age = _read_lease(spark, fs, rel)
            if cur is None or cur.get("token"):
                break  # vanished, or readable with a token
            time.sleep(0.2)
        if cur is not None and cur.get("token") == token:
            delete_checked(fs, rel, what="maintenance lease")
        elif cur is None:
            _log.warning(
                "maintenance lease on %s vanished AFTER the release "
                "rename claimed it — unexpected (nothing else knows "
                "the release name); treat as released", root)
        else:
            # a rival's lock (breaker took over mid-run) or
            # unreadable content: restore its path — stealing a live
            # rival's lock is the exact race this rename exists to
            # close, and an unreadable lock MIGHT be a rival's
            try:
                restored = fs.rename(rel, lock)
            except Exception:
                restored = False
            if cur.get("token"):
                _log.warning(
                    "maintenance lease on %s was REPLACED mid-run "
                    "(now held by %r) — %s; two maintenance runs may "
                    "have interleaved", root, cur.get("owner"),
                    "restored to its path" if restored else
                    f"could NOT be restored (it is at {rel}; move it "
                    "back manually)")
            else:
                _log.warning(
                    "maintenance lease on %s exists but could not be "
                    "READ to verify ownership — leaving it%s "
                    "(deleting a possible rival's lock risks "
                    "concurrent writers); if no other maintenance "
                    "run is active, it is this run's and can be "
                    "deleted manually or broken with break_lease="
                    "True once stale", root,
                    "" if restored else f" at {rel}")

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
