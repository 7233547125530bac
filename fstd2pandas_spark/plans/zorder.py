"""Z-order (Morton) clustering — the multi-dimensional data-skipping
layout (Delta ``OPTIMIZE ZORDER BY``, Iceberg sort orders, the classic
Morton-curve literature).

A table range-partitioned and sorted on ONE column skips files well for
predicates on that column and not at all for others; interleaving the
bits of several quantized columns into one Morton key gives every
participating column locality, so parquet min/max pruning works for
predicates on ANY of them. At 100 TB this is a WRITE-SIDE layout
decision: pay one global sort at ingest, then every mixed-predicate
scan reads a fraction of the files forever after.

The key is a pure integer Column expression (bit arithmetic only — an
SQL oracle reproduces it exactly); :func:`zorder_repartition` applies
the layout with one range-partitioned sort, the exact plan a cluster
write wants (`repartitionByRange` + file split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension — 16 keeps d <= 3 keys inside a signed 64-bit int
DEFAULT_BITS = 16


def zorder_key(cols: "list[str]",
               bits: int = DEFAULT_BITS) -> Column:
    """Morton key interleaving the low ``bits`` bits of each named
    column (values are masked, so callers quantize wider domains into
    a projected column first — e.g. ``F.floor(x / step)``). Bit ``i``
    of column ``d`` lands at position ``i * n_dims + d``; total width
    ``bits * n_dims`` must fit a signed 64-bit integer."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if bits < 1:
        raise ValueError("zorder_key: bits must be >= 1")
    if bits * n > 63:
        raise ValueError(
            f"{bits} bits x {n} dims = {bits * n} exceeds a signed int64")
    if not all(isinstance(c, str) for c in cols):
        # quantized expressions belong in a caller-controlled projection
        # (withColumn) so the generated SQL has a stable name to read
        raise ValueError("zorder_key: pass column NAMES; project "
                         "quantizer expressions first")
    # ONE SQL string, not bits*n Column-DSL nodes: the DSL costs a py4j
    # round-trip per node (~130 trips for two 16-bit dims — measured
    # ~0.1 s of pure driver-side build per call; expr() parses JVM-side
    # in one trip)
    mask = (1 << bits) - 1
    terms = []
    for d, name in enumerate(cols):
        src = f"(CAST(`{name}` AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"(shiftleft((shiftright({src}, {i}) & 1), "
                         f"{i * n + d}))")
    return F.expr("(" + " + ".join(terms) + ")")


def zorder_repartition(df: DataFrame, cols: "list[str]",
                       num_partitions: "int | None" = None,
                       bits: int = DEFAULT_BITS,
                       key_col: str = "_zorder") -> DataFrame:
    """Cluster the frame on the Morton key of ``cols``: ONE
    range-partition exchange + per-partition sort (the global-sort
    write layout), key column dropped from the result. Each output
    file then covers a compact hyper-rectangle of the key space, so
    min/max pruning serves predicates on any participating column."""
    if key_col in df.columns:
        raise ValueError(
            f"zorder_repartition: column {key_col!r} already exists — "
            "withColumn would silently destroy it; pass a free key_col")
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    part = (keyed.repartitionByRange(num_partitions, key_col)
            if num_partitions is not None
            else keyed.repartitionByRange(key_col))
    return part.sortWithinPartitions(key_col).drop(key_col)
