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
