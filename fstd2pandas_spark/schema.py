"""Core record-table schema and codec constants.

The fundamental abstraction is a *record table*: one row per 2-D field
record, 19 fixed metadata keys plus a derived ``grid`` identifier and the
field data ``d`` as ``array<float>`` (row-major flattened; ``ni`` is the
fastest-varying index, so element (i, j), 1-based, lives at
``d[(j-1)*ni + (i-1)]``).

Parity targets (reference file:line):
- BASE_COLUMNS        /root/reference/fstpy/__init__.py:355
- DATYP_DICT          /root/reference/fstpy/__init__.py:94-108
- KIND_DICT           /root/reference/fstpy/__init__.py:116-129
- reserved meta nomvars  /root/reference/fstpy/std_reader.py:61,
                         /root/reference/fstpy/dataframe_utils.py:21-24
- dtype from (datyp,nbits)  /root/reference/fstpy/std_io.py:633-644
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Canonical column order of the record table.
BASE_COLUMNS = [
    "nomvar", "typvar", "etiket",
    "ni", "nj", "nk",
    "dateo", "ip1", "ip2", "ip3",
    "deet", "npas", "datyp", "nbits",
    "grtyp", "ig1", "ig2", "ig3", "ig4",
    "datev", "grid", "d",
]

#: Reserved nomvars identifying coordinate/descriptor ("meta") records.
META_NOMVARS = ["!!", "P0", "PT", ">>", "^^", "^>", "HY", "!!SF"]

#: Subset of META_NOMVARS that carry horizontal-grid axes.
GRID_META_NOMVARS = [">>", "^^", "^>"]

#: storage data-type code -> letter alias.
DATYP_DICT = {
    0: "X", 1: "R", 2: "I", 3: "C", 4: "S", 5: "E", 6: "F", 7: "A", 8: "Z",
    130: "i", 132: "s", 133: "e", 134: "f",
}

#: vertical-level kind code -> printable alias.
KIND_DICT = {
    -1: "_", 0: "m", 1: "sg", 2: "mb", 3: "   ", 4: "M", 5: "hy",
    6: "th", 10: "H", 15: "  ", 17: " ", 21: "mp",
}

#: level kinds whose surfaces follow the topography (std_dec.py:215-233).
FOLLOW_TOPOGRAPHY_KINDS = [1, 4, 5]

#: level kind -> levels sort ascending? (std_dec.py:71-85)
ASCENDING_KINDS = {0: True, 1: False, 2: False, 3: True, 4: True, 5: False,
                   6: True, 10: True, 15: True, 17: True, 21: True}

#: Spark schema of the record table (metadata as primitives, data as array).
RECORD_SCHEMA = T.StructType([
    T.StructField("nomvar", T.StringType(), False),
    T.StructField("typvar", T.StringType(), False),
    T.StructField("etiket", T.StringType(), False),
    T.StructField("ni", T.IntegerType(), False),
    T.StructField("nj", T.IntegerType(), False),
    T.StructField("nk", T.IntegerType(), False),
    T.StructField("dateo", T.LongType(), False),
    T.StructField("ip1", T.IntegerType(), False),
    T.StructField("ip2", T.IntegerType(), False),
    T.StructField("ip3", T.IntegerType(), False),
    T.StructField("deet", T.IntegerType(), False),
    T.StructField("npas", T.IntegerType(), False),
    T.StructField("datyp", T.IntegerType(), False),
    T.StructField("nbits", T.IntegerType(), False),
    T.StructField("grtyp", T.StringType(), False),
    T.StructField("ig1", T.IntegerType(), False),
    T.StructField("ig2", T.IntegerType(), False),
    T.StructField("ig3", T.IntegerType(), False),
    T.StructField("ig4", T.IntegerType(), False),
    T.StructField("datev", T.LongType(), False),
    T.StructField("grid", T.StringType(), True),
    T.StructField("d", T.ArrayType(T.FloatType()), True),
    # transient source columns (dropped by readers unless asked to keep)
    T.StructField("path", T.StringType(), True),
    T.StructField("key", T.LongType(), True),
])

#: 19-column duplicate-detection key (``ig2`` deliberately excluded —
#: dataframe.py:277-279 keeps it out so re-gridded copies still dedupe).
DEDUP_COLUMNS = [
    "nomvar", "typvar", "etiket", "ni", "nj", "nk", "dateo",
    "ip1", "ip2", "ip3", "deet", "npas", "datyp", "nbits",
    "grtyp", "ig1", "ig3", "ig4", "datev",
]


#: template-row defaults (reference dataframe.py:675-700).
RECORD_DEFAULTS = {
    "nomvar": " ", "typvar": "P", "etiket": " ",
    "ni": 1, "nj": 1, "nk": 1,
    "dateo": 0, "ip1": 0, "ip2": 0, "ip3": 0,
    "deet": 0, "npas": 0, "datyp": 133, "nbits": 16,
    "grtyp": "G", "ig1": 0, "ig2": 0, "ig3": 0, "ig4": 0,
    "datev": 0, "grid": None, "d": None,
}


def empty_record_table(spark, num_rows: int, **overrides):
    """G17 (reference dataframe.py:675-700 ``create_empty_dataframe``):
    a template record table of ``num_rows`` default rows. ``overrides``
    replace any default with a constant. Built as ``spark.range`` +
    literal columns — no driver-side row list, so a billion-row template
    is as cheap as a ten-row one."""
    from pyspark.sql import functions as F

    vals = dict(RECORD_DEFAULTS, **overrides)
    df = spark.range(num_rows).drop("id")
    for f in RECORD_SCHEMA.fields:
        if f.name in ("path", "key"):
            continue
        df = df.withColumn(f.name, F.lit(vals[f.name]).cast(f.dataType))
    return df


def field_dtype(datyp: int, nbits: int) -> str:
    """numpy-style dtype name selected by (datyp, nbits).

    Mirrors get_field_dtype (std_io.py:633-644): float datyps pick
    float32/float64 on the 32-bit boundary; integer datyps pick signed or
    unsigned 32-bit.
    """
    if datyp in (1, 5, 6, 133, 134):   # real / IEEE / compressed float
        return "float64" if nbits > 32 else "float32"
    if datyp in (2, 130):              # unsigned integer
        return "uint32"
    if datyp in (4, 132):              # signed integer
        return "int32"
    return "float32"
