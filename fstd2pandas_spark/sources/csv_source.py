"""CSV record source/sink in the reference dialect (SURVEY §2.1 S11-S12;
reference csv_reader.py:85-504, csv_writer.py:11-137).

Dialect:
- ``#``-prefixed comment lines;
- required: nomvar + (level XOR ip1) + d;
- ``d`` encodes the 2-D array as ``"a,b;c,d"`` — ``;`` separates grid
  rows (j), ``,`` separates values along i;
- 14 defaulted columns (etiket CSVREADER, typvar X, datyp 1, nbits 24,
  grtyp X, ip2/ip3/ig1-4/deet/npas 0 — csv_reader.py:38-50);
- ``level`` is encoded to ip1 with kind 3 (arbitrary, csv_reader.py:17)
  when ``encode_ip1=True``;
- per-(nomvar, etiket, grtyp...) group dimension consistency is an
  invariant the caller can assert via
  :func:`fstd2pandas_spark.operators.dedup.group_invariant_violations`.

Everything is spark.read.csv + native expressions: the d-string parse is
``split``/``transform``/``flatten`` (JVM-side), no Python row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.codecs import encode_ip_expr

DEFAULTS = {
    "typvar": "X", "etiket": "CSVREADER", "ip2": 0, "ip3": 0,
    "datyp": 1, "nbits": 24, "grtyp": "X",
    "ig1": 0, "ig2": 0, "ig3": 0, "ig4": 0, "deet": 0, "npas": 0,
    "dateo": 0, "datev": 0, "nk": 1,
}

ADMISSIBLE = ["nomvar", "typvar", "etiket", "level", "dateo", "ip1", "ip2",
              "ip3", "deet", "npas", "datyp", "nbits", "grtyp", "ig1",
              "ig2", "ig3", "ig4", "d", "datev", "ni", "nj", "nk"]

CSV_IP1_KIND = 3  # csv_reader.py:17


class CsvReaderError(Exception):
    pass


def read_csv_records(spark: SparkSession, path: str,
                     encode_ip1: bool = True) -> DataFrame:
    """Read a reference-dialect CSV into the record table."""
    raw = (
        spark.read.option("header", "true").option("comment", "#")
        .option("inferSchema", "false")
        .csv(path)
    )
    bad = [c for c in raw.columns if c not in ADMISSIBLE]
    if bad:
        raise CsvReaderError(f"inadmissible columns: {bad}")
    if "nomvar" not in raw.columns or "d" not in raw.columns:
        raise CsvReaderError("nomvar and d are required")
    has_level = "level" in raw.columns
    has_ip1 = "ip1" in raw.columns
    if has_level == has_ip1:
        raise CsvReaderError("exactly one of level/ip1 must be present")

    df = raw
    for col, default in DEFAULTS.items():
        if col not in df.columns:
            df = df.withColumn(col, F.lit(default))

    # "a,b;c,d" -> rows(j) of values(i) -> flat array (ni fastest)
    rows2d = F.transform(
        F.split(F.col("d"), ";"),
        lambda r: F.transform(F.split(r, ","), lambda x: x.try_cast("float")),
    )
    # nullif(size, -1): under non-ANSI config, legacy sizeOfNull makes
    # F.size(NULL) return -1 — a wholly-NULL d cell would yield
    # ni = nj = -1 (non-NULL, invisible to the NULL scan below) and
    # slip past the eager validation only on that config. No legitimate
    # array has size -1, so this is a no-op under ANSI (the text.py
    # size_col rule: validation loudness must not depend on config).
    df = (
        df.withColumn("_rows", rows2d)
        .withColumn("nj", F.nullif(F.size(F.col("_rows")),
                                   F.lit(-1)).cast("int"))
        .withColumn("ni", F.nullif(F.size(F.element_at(F.col("_rows"), 1)),
                                   F.lit(-1)).cast("int"))
    )
    df = df.withColumn("d", F.flatten(F.col("_rows")))
    if encode_ip1 and has_level:
        df = df.withColumn(
            "ip1",
            encode_ip_expr(F.col("level").try_cast("double"), F.lit(CSV_IP1_KIND)),
        ).drop("level")
    elif has_level:
        df = df.withColumn("ip1", F.col("level").try_cast("int")).drop("level")

    ints = ["ni", "nj", "nk", "ip1", "ip2", "ip3", "deet", "npas", "datyp",
            "nbits", "ig1", "ig2", "ig3", "ig4"]
    for c in ints:
        df = df.withColumn(c, F.col(c).try_cast("int"))
    df = df.withColumn("dateo", F.col("dateo").try_cast("long"))
    df = df.withColumn("datev", F.col("datev").try_cast("long"))

    # Eager ingest validation, ONE aggregation job (CSV is the
    # small-file path; the reference is eager too):
    # - rectangularity: every ';'-row must have ni values, or
    #   len(d) != ni*nj flows silently downstream (reference raises
    #   ArrayIsNotStableError, csv_reader.py:475-487);
    # - unparseable cells: try_cast turns a typo'd or empty numeric
    #   cell into NULL on EVERY config (a bare cast would be a silent
    #   NULL under non-ANSI and an opaque NumberFormatException under
    #   ANSI) — and a NULL element inside ``d`` means
    #   MASKED in this engine (mask.py), so a bad CSV cell would read
    #   as a masked grid point; the reference raises on the
    #   np.array/astype conversion (csv_reader.py:489-504), so does
    #   this reader, naming the column.
    check_cols = ints + ["dateo", "datev"]
    flags = df.agg(
        F.max(F.exists("_rows", lambda r: F.size(r) != F.col("ni"))
              .cast("int")).alias("_ragged"),
        # d.isNull() first: a wholly-NULL d cell makes F.exists return
        # NULL, which max() skips — the flag would fire only via the
        # ni/nj NULL scan, i.e. only under ANSI config without this
        F.max((F.col("d").isNull()
               | F.exists("d", lambda x: x.isNull()))
              .cast("int")).alias("d"),
        *[F.max(F.col(c).isNull().cast("int")).alias(c)
          for c in check_cols],
    ).collect()[0]
    if flags["_ragged"]:
        raise CsvReaderError(
            "ragged 'd' array: every ';'-separated row must have the "
            "same number of ','-separated values")
    bad = [c for c in ["d", *check_cols] if flags[c]]
    if bad:
        raise CsvReaderError(
            f"unparseable or empty numeric cell(s) in column(s) {bad} "
            "— a silent NULL here would read as masked/garbage "
            "metadata downstream; fix the CSV (the reference raises "
            "on the same conversion)")
    df = df.drop("_rows")

    from fstd2pandas_spark.operators.metadata import add_grid_column

    order = ["nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo", "ip1",
             "ip2", "ip3", "deet", "npas", "datyp", "nbits", "grtyp",
             "ig1", "ig2", "ig3", "ig4", "datev", "grid", "d"]
    return add_grid_column(df).select(*order)


def dimension_violations(df: DataFrame) -> DataFrame:
    """Groups whose records disagree on (ni, nj) — the reference raises
    ArrayIsNotStableError (csv_reader.py:475-487)."""
    return (
        df.groupBy("nomvar", "etiket", "typvar", "grtyp")
        .agg(F.countDistinct("ni", "nj").alias("n_dims"))
        .filter(F.col("n_dims") > 1)
    )


def write_csv_records(df: DataFrame, path: str, mode: str = "error") -> None:
    """Sink: stringify ``d`` back to the "a,b;c,d" dialect and write CSV
    (csv_writer.py:11-137)."""
    nj = F.col("nj")
    ni = F.col("ni")
    rows = F.transform(
        F.sequence(F.lit(1), nj),
        lambda j: F.array_join(
            F.transform(F.slice(F.col("d"), (j - 1) * ni + 1, ni),
                        lambda x: x.cast("string")),
            ",",
        ),
    )
    out = df.withColumn("d", F.array_join(rows, ";"))
    (
        out.select("nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo",
                   "ip1", "ip2", "ip3", "deet", "npas", "datyp", "nbits",
                   "grtyp", "ig1", "ig2", "ig3", "ig4", "datev", "d")
        .write.mode(mode).option("header", "true").csv(path)
    )
