"""Session-window rollups (extension alongside SURVEY §2.10): gap-based
sessions over an event stream, one expression for batch AND Structured
Streaming.

``F.session_window`` is the engine-native path: Catalyst merges
overlapping [t, t+gap) windows per key (batch), and the streaming
runtime keeps per-key session state that a watermark expires — the
exact semantics a hand-rolled gaps-and-islands window would need a
stateful shuffle to reproduce. Session boundary: windows merge when
they overlap OR touch, so events exactly `gap` apart share a session —
a new session starts only on a STRICTLY larger gap (pinned by the
oracle mirror and the stream==batch test).

Scale shape: ONE shuffle on the session key (the groupBy); no global
sort, no per-user collect. Skewed keys (one bot user with millions of
events) stay inside Spark's aggregation machinery — state is one
running (start, end, count, sum) per open session, not the event list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(df: DataFrame, ts_col: str = "ts",
               key_col: str = "user_id", gap: str = "30 minutes",
               value_col: str = "value",
               extra_sums: "dict[str, str] | None" = None) -> DataFrame:
    """Per-key session stats: (key, session_start, session_end,
    n_events, sum_value). ``session_end`` is Spark's definition — last
    event + gap. ``extra_sums`` maps extra output columns to numeric
    input columns summed per session (long). Works unchanged on a
    watermarked stream (append mode emits a session once the watermark
    passes its close).

    EXCLUSION CONTRACT: events with a NULL timestamp (no position on
    the time axis — the asof_join/funnel rule) or a NULL key are
    excluded, EXPLICITLY. ``session_window`` happens to drop NULL
    timestamps itself, but silently, and it GROUPS all NULL keys
    together — two unrelated unidentified users' events would read as
    one pseudo-user's session (co-occurrence that never happened, the
    md5('')-collapse class from streaming_exact_dedup). The filter
    below makes both rules engine-independent and visible in the plan;
    their value/extra columns drop out of the sums with them."""
    df = df.filter(F.col(ts_col).isNotNull()
                   & F.col(key_col).isNotNull())
    w = F.session_window(F.col(ts_col), gap)
    aggs = [F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,6)"))
                    .cast("double"), 4).alias("sum_value")]
    extra = list((extra_sums or {}).items())
    aggs += [F.sum(F.col(src)).cast("long").alias(name)
             for name, src in extra]
    return (
        df.groupBy(w, F.col(key_col))
        .agg(*aggs)
        .select(F.col(key_col),
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events", "sum_value",
                *[name for name, _ in extra])
    )
