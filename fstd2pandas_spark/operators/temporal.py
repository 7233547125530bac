"""Temporal joins Spark lacks as primitives: as-of join and range join.

Both are classic time-series/observability operators (pandas
``merge_asof``, kdb ``aj``, DuckDB ``ASOF JOIN``, the Databricks range
join optimization) re-expressed in Spark's execution model:

- :func:`asof_join` is the union-and-window-fill formulation — tag both
  inputs, sort each key's rows once, and carry the latest right-side
  payload forward with ``last(ignorenulls)``. ONE shuffle on the key,
  NO join operator at all: at fact-table scale this beats any
  join-based formulation because the right side is never re-scanned
  per left row and nothing can explode — each left row emits exactly
  one output row.
- :func:`range_join` is the bin-bucketed equi-join — intervals explode
  into the fixed-width time bins they cover, points carry their single
  bin, and the exact range predicate filters after a plain (key, bin)
  equi-join. Spark alone would plan point-in-interval as
  BroadcastNestedLoopJoin (quadratic); the bins turn it into a
  shuffle/merge join whose fan-out is bounded by interval length /
  bin width (guarded: a hostile open-ended interval raises instead of
  exploding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fstd2pandas_spark.functions.timeutil import wall_epoch_us


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", right_on: "str | None" = None,
              direction: str = "backward",
              tolerance: "int | None" = None,
              right_cols: "list[str] | None" = None,
              prefix: str = "asof_") -> DataFrame:
    """For every left row, attach the closest right row of the same
    ``by`` key at-or-before its time (``direction='backward'``; at or
    after for ``'forward'``; closest in either direction with
    prior-on-tie for ``'nearest'``, the pandas merge_asof rule),
    optionally within ``tolerance`` seconds.

    Output = every left row + ``{prefix}<col>`` for each of
    ``right_cols`` + ``{prefix}ts_us`` (the matched right time,
    microseconds) — NULL when no right row qualifies. A NULL time on
    EITHER side never matches: a left row with unknown time gets NULL
    match columns, a right row with unknown time contributes no
    payload (an observation with no position on the axis cannot be
    "closest" to anything). A NULL ``by`` key never matches either
    (round 16, the NULL-identity contract shared with sessionize and
    the funnel): two unidentified entities are not known to be the
    same one, so pooling them fabricates temporal co-occurrence —
    NULL-key left rows are kept, unmatched. Equal timestamps
    match (inclusive, like pandas merge_asof); several right rows on
    the exact same key and timestamp resolve to the MAXIMAL right
    payload in ``right_cols`` tuple order — the payload struct rides
    the window ordering, so the carried row never depends on partition
    arrival order (``right_cols`` must therefore be orderable types;
    they are comparable by definition for ties to be resolvable at
    all).

    Plan shape: union the tagged inputs, ONE window over (by) ordered
    by (time, side) carrying the right payload forward with
    last(ignorenulls) — one exchange, one per-key sort, no join, one
    output row per left row. This is the at-scale formulation: a
    join-based as-of needs an inequality join (nested-loop) or a
    per-left-row aggregation; here the right side is read once and
    merged in sorted order, exactly the kdb/pandas merge-asof plan
    distributed by key.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in (by, right_on or on)]
    r_on = right_on or on
    # TZ-independent, dtype-aware epochs (round 17, timeutil.py):
    # numeric axes are epoch seconds, LTZ instants take the
    # decimal-cast epoch, wall times the field arithmetic — none
    # routes through spark.sql.session.timeZone
    us_l = wall_epoch_us(left, on)
    us_r = wall_epoch_us(right, r_on)

    payload = F.struct(
        us_r.alias("_ts_us"),
        *[F.col(c).alias(c) for c in right_cols]).alias("_pay")
    # a right row with a NULL/uncastable time has no position on the
    # axis and must match NOTHING: under the ascending orderings it
    # sorted FIRST and its payload was carried into every left row
    # until the first real right row — a fabricated match with an
    # unknown-time observation (cheap per-row cast, filtered on the
    # source column before the window)
    # NULL-identity exclusion (round 16, the sessions.py/funnel
    # contract): window partitioning GROUPS NULL keys, so an
    # unidentified right row would "match" every unidentified left
    # row — a temporal co-occurrence between entities never known to
    # be the same. Filtering the RIGHT side is sufficient AND keeps
    # every left row: a NULL-key left row lands in a partition with
    # no payload and gets NULL match columns, like an unmatched row.
    r = (right.filter(us_r.isNotNull() & F.col(by).isNotNull())
         .select(F.col(by).alias("_k"), us_r.alias("_us"),
                 F.lit(0).alias("_side"), payload))
    l = left.select(
        F.col(by).alias("_k"), us_l.alias("_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"))
    r = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType))
    u = l.select("_k", "_us", "_side", "_pay", "_row").unionByName(
        r.select("_k", "_us", "_side", "_pay", "_row"))

    # backward: ascending time, right rows (side 0) BEFORE left rows at
    # the same timestamp so equal times match; forward mirrors it.
    # _pay asc as the final key makes last(ignorenulls) pick the
    # MAXIMAL payload among same-(key, ts) right rows — deterministic
    # tie resolution instead of partition arrival order (left rows'
    # NULL _pay sorts first and only ever ties with other left rows,
    # which carry no payload to choose between)
    if direction == "nearest":
        # ONE ascending sort serves BOTH sides: the backward fill runs
        # over (unboundedPreceding, current) and the forward peek over
        # (current, unboundedFollowing) — same partitioning, same
        # ordering, so Spark plans one exchange and one sort. Same-ts
        # right rows sort before the left row, land on the backward
        # side at gap 0, and win every tie (pandas' prior-on-tie
        # rule); future-side payload ties resolve to the MINIMAL
        # payload (first over _pay asc) where the past side resolves
        # to the maximal — both deterministic.
        wb = (Window.partitionBy("_k")
              .orderBy(F.col("_us").asc(), F.col("_side").asc(),
                       F.col("_pay").asc())
              .rowsBetween(Window.unboundedPreceding, 0))
        wf = (Window.partitionBy("_k")
              .orderBy(F.col("_us").asc(), F.col("_side").asc(),
                       F.col("_pay").asc())
              .rowsBetween(0, Window.unboundedFollowing))
        back = F.last("_pay", ignorenulls=True).over(wb)
        fwd = F.first("_pay", ignorenulls=True).over(wf)
        out = (u.withColumn("_b", back).withColumn("_f", fwd)
               .filter(F.col("_side") == 1))
        gb = F.col("_us") - F.col("_b._ts_us")
        gf = F.col("_f._ts_us") - F.col("_us")
        out = out.withColumn(
            "_m",
            F.when(F.col("_b").isNull(), F.col("_f"))
            .when(F.col("_f").isNull(), F.col("_b"))
            .when(gb <= gf, F.col("_b")).otherwise(F.col("_f")))
    else:
        if direction == "backward":
            w = (Window.partitionBy("_k")
                 .orderBy(F.col("_us").asc(), F.col("_side").asc(),
                          F.col("_pay").asc())
                 .rowsBetween(Window.unboundedPreceding, 0))
        else:
            w = (Window.partitionBy("_k")
                 .orderBy(F.col("_us").desc(), F.col("_side").asc(),
                          F.col("_pay").asc())
                 .rowsBetween(Window.unboundedPreceding, 0))
        matched = F.last("_pay", ignorenulls=True).over(w)
        out = (u.withColumn("_m", matched)
               .filter(F.col("_side") == 1))
    # a LEFT row with a NULL/uncastable time gets NO match: backward's
    # ascending sort happened to put it before every right row (NULL
    # by luck), but forward's DESCENDING sort put it last — matched to
    # the EARLIEST right row — and nearest fell through to the
    # forward peek; a row whose time is unknown must not correlate
    # with anything (post-window attribute filter, no re-evaluation)
    out = out.withColumn(
        "_m", F.when(F.col("_us").isNotNull(), F.col("_m")))
    if tolerance is not None:
        gap = {"backward": F.col("_us") - F.col("_m._ts_us"),
               "forward": F.col("_m._ts_us") - F.col("_us"),
               "nearest": F.abs(F.col("_us") - F.col("_m._ts_us")),
               }[direction]
        out = out.withColumn(
            "_m", F.when(gap <= int(tolerance) * 1_000_000, F.col("_m")))
    return out.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        F.col("_m._ts_us").alias(f"{prefix}ts_us"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols])


#: ceiling on bins per interval — an open-ended/hostile interval must
#: raise loudly, not explode the build side by a million rows
MAX_BINS_PER_INTERVAL = 10_000


def range_join(points: DataFrame, intervals: DataFrame, on: str = "ts",
               start_col: str = "start", end_col: str = "end",
               by: "str | None" = None,
               bin_width: int = 3600) -> DataFrame:
    """All (point, interval) matches with ``start <= point.ts <= end``
    (and equal ``by`` keys when given) — the point-in-interval join.

    Plan shape: each interval explodes into the ``bin_width``-second
    time bins it covers (fan-out = duration / bin_width, capped at
    ``MAX_BINS_PER_INTERVAL`` with a loud error); each point carries
    its single bin; a plain equi-join on (by, bin) + the exact range
    filter finishes. A point lies in exactly one bin, so a matching
    pair meets exactly once — no post-join dedup. Without the bins
    Spark plans this predicate as BroadcastNestedLoopJoin; with them
    it is an ordinary shuffle join sized by real overlap density.
    Output = point columns + interval columns (caller disambiguates
    names beforehand).
    """
    wus = int(bin_width) * 1_000_000
    # TZ-independent, dtype-aware epochs (round 17, timeutil.py)
    p_us = wall_epoch_us(points, on)
    s_us = wall_epoch_us(intervals, start_col)
    e_us = wall_epoch_us(intervals, end_col)
    n_bins = (F.floor(e_us / wus) - F.floor(s_us / wus) + 1)
    iv = intervals.withColumn("_nb", n_bins)
    # three-way gate: valid intervals explode; oversized intervals
    # raise LOUDLY (silent truncation would under-report matches);
    # inverted (end < start, _nb < 1) or NULL-bounded intervals match
    # NOTHING (empty explode drops the row) — without the lower bound,
    # Spark's sequence(start, stop) defaults to step -1 for start >
    # stop and a swapped-column interval explodes into millions of
    # DESCENDING bins, the exact blowup the cap exists to prevent
    bad = f"interval spans more than {MAX_BINS_PER_INTERVAL} bins"
    iv = iv.withColumn(
        "_bin",
        F.explode(
            F.when(F.col("_nb").between(1, MAX_BINS_PER_INTERVAL),
                   F.sequence(F.floor(s_us / wus), F.floor(e_us / wus)))
            .when(F.col("_nb") > MAX_BINS_PER_INTERVAL,
                  F.raise_error(F.lit(bad)))
            .otherwise(F.array().cast("array<bigint>"))))
    pt = points.withColumn("_bin", F.floor(p_us / wus))
    cond = [pt["_bin"] == iv["_bin"]]
    if by is not None:
        cond.append(pt[by] == iv[by])
    joined = pt.join(iv, cond, "inner").filter(
        (p_us >= s_us) & (p_us <= e_us))
    drop = [pt["_bin"], iv["_bin"], iv["_nb"]] + \
        ([iv[by]] if by is not None else [])
    out = joined
    for c in drop:
        out = out.drop(c)
    return out
