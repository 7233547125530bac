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

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """``(FileSystem, Path)`` for ``path`` on ITS OWN filesystem (the
    scheme/authority in the path wins over ``fs.defaultFS``)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def jpath(spark: SparkSession, *parts: str):
    """A Hadoop ``Path`` from parts (no filesystem resolution)."""
    return spark._jvm.org.apache.hadoop.fs.Path(*parts)
