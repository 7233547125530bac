"""Sources and sinks (SURVEY §2.1).

- :mod:`fst_datasource` — Python DataSource V2 for the .fstrec record
  container (parallel per-file scan, header-directory filter pushdown,
  lazy payloads, Arrow batches; read + write).
- :mod:`csv_source` — the reference's CSV dialect ("a,b;c,d" arrays,
  defaulted columns, level->ip1 encode) on spark.read.csv + expressions.
- :func:`read_records` / :func:`write_records` — parquet record tables
  (the interchange format used by tests and the driver's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fstd2pandas_spark.sources.fst_datasource import FstRecDataSource, register
from fstd2pandas_spark.sources.csv_source import (
    read_csv_records,
    write_csv_records,
    dimension_violations,
)
from fstd2pandas_spark.sources.writer import (
    detect_rewrite,
    write_record_table,
)


def read_records(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet record table (schema-checked lazily)."""
    return spark.read.parquet(path)


def write_records(df: DataFrame, path: str, mode: str = "error",
                  partition_by: "list[str] | None" = None) -> None:
    """Write a record table as parquet. At 100 TB partition by the pruning
    dimensions (date, grid) so downstream scans prune directories."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


__all__ = [
    "FstRecDataSource", "register", "read_csv_records", "write_csv_records",
    "dimension_violations", "read_records", "write_records",
    "detect_rewrite", "write_record_table",
]
