"""Sessionization for event streams (web/clickstream corpora).

Groups a user's events into sessions separated by inactivity gaps —
the standard unit of web-behavior analysis (session counts, dwell
time, events-per-visit) and the grouping a crawl-log or interaction
dataset is rolled up by before training-data sampling.

Spark-first: the batch path is one ``groupBy(user,
F.session_window(ts, gap))`` — Spark's NATIVE session-window
aggregation (Catalyst merges overlapping [ts, ts+gap) intervals
per group inside the aggregate; no self-join, no window-lag pass,
no Python).  The streaming path is the same expression under a
watermark, which is exactly how Structured Streaming bounds session
state (sessions older than the watermark horizon are finalized and
evicted).

Gap semantics (both paths, and the DuckDB oracle replays them):
Spark merges session windows that TOUCH — an event whose ts is at or
before the session's current end (= previous event's ts + gap)
extends it, including an event at exactly ``prev_ts + gap``
(verified against Spark 4.1: ``[00:00] + [00:30] @ gap 30m`` is ONE
session ending 01:00).  Equivalently, in gaps-and-islands form:
``ts - lag(ts) > gap -> new session`` (strict).

Scale: ONE shuffle on the user key.  Partial per-partition session
merges happen map-side (the session aggregate is associative over
interval unions), so the shuffle carries merged spans, not raw
events.  A pathological hot user (bot traffic) concentrates on one
reducer — sessionization cannot be salted the way counting can
(sessions need a user's full timeline contiguous), so the mitigation
at scale is upstream: cap events per user per day (bot filtering —
:func:`hooqu_spark.ops.cap_per_key` is the skew-safe cap) before
sessionizing, or pre-aggregate with a coarse time-bucket pre-session
pass.  Both are standard; the hot-user bound is documented rather
than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """One row per (user, session): session start/end timestamps,
    event count and the span between first and last event.

    Output columns: ``<user_col>``, ``session_start`` (first event
    ts), ``session_end`` (last event ts + gap — Spark's session
    window end, i.e. the instant the session would have expired),
    ``n_events``, ``session_micros`` (last - first event, in
    microseconds — integer-exact, engine-portable).

    Rows with NULL user or NULL ts carry no session information and
    are dropped (documented; matches the oracle).
    """
    clean = df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    sw = F.session_window(F.col(ts_col), gap)
    return (
        clean.groupBy(F.col(user_col), sw.alias("_sw"))
        .agg(
            F.min(ts_col).alias("_first"),
            F.max(ts_col).alias("_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            user_col,
            F.col("_first").alias("session_start"),
            F.col("_sw.end").alias("session_end"),
            "n_events",
            # timestampdiff, not unix_micros: works for TIMESTAMP and
            # TIMESTAMP_NTZ alike and is timezone-independent (an
            # epoch-based difference would shift across a DST boundary
            # under a non-UTC session timezone)
            F.expr("timestampdiff(MICROSECOND, _first, _last)").alias(
                "session_micros"
            ),
        )
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-user session rollup: ``n_sessions``, ``total_events``,
    ``avg_session_micros`` — the second aggregation reuses the first
    shuffle's partitioning (both key on the user), so Catalyst plans
    it without a second exchange."""
    s = sessionize(df, user_col, ts_col, gap)
    return s.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.avg("session_micros").alias("avg_session_micros"),
    )


def streaming_sessions(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: the SAME session-window aggregate
    under a watermark.  State is bounded by the watermark horizon —
    a session is held open only while a late event could still
    legally extend it; once the watermark passes ``session_end`` the
    session finalizes, emits, and its state is evicted.  Use with
    append output mode (each session emitted exactly once, when
    final)."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        stream_df.where(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), sw.alias("_sw"))
        # _sw.start already carries the first-event timestamp; a
        # min(ts) aggregate here would be dead per-session state.
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("_sw.start").alias("session_start"),
            F.col("_sw.end").alias("session_end"),
            "n_events",
        )
    )
