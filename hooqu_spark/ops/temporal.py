"""Temporal (as-of) join — point-in-time enrichment.

Joins each left row to the MOST RECENT right row per key with
``right.ts <= left.ts`` (backward, inclusive) — the point-in-time
lookup every feature/training pipeline needs: enrich a crawl page
with the domain's latest robots policy snapshot, an event with the
user's latest profile version, a trade with the prevailing quote.
Point-in-time correctness is what prevents future leakage in
training data.

Spark has no native as-of join; the classic emulations are a range
join (O(n·m) per key worst case, needs a blow-up-prone inequality
join) or per-key ``applyInPandas`` (Python in the hot path).  This
implementation is the UNION-WINDOW form instead — pure Catalyst:

1. tag both inputs and union them (schema-aligned, right payload
   packed in ONE struct so a right row whose payload values are NULL
   still matches — ``last(..., ignorenulls=True)`` skips NULLs, so
   the struct, never null for right rows, is what's carried);
2. one window ``last(payload, ignorenulls=True) over (partition by
   key order by (ts, tag) rows unbounded preceding .. current)``
   with right rows ordered BEFORE left rows at equal ts (inclusive
   match);
3. keep the left rows and unpack the struct.

Cost: ONE shuffle on the key (the window sort), no join node at all
— the plan cannot produce a cartesian blow-up, and a 1000-executor
run shuffles each key's timeline to one place exactly once, which is
the minimum any per-key temporal semantics requires.  Skew: a hot
key's full timeline lands on one reducer (inherent to per-key
ordering); mitigate upstream by time-bucketing the key for
bounded-staleness lookups.

The DuckDB oracle replays this with the native ``ASOF JOIN``
(identical backward-inclusive semantics), so the contract
cross-verifies two INDEPENDENT as-of implementations.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One or more "<number> <unit>" terms, e.g. "2 hours", "1 day 12 hours".
# Validated at the API boundary so a malformed caller string fails with
# a clear ValueError instead of surfacing as a Catalyst parse error (or,
# worse, silently concatenating into the INTERVAL literal).  Fractions
# are allowed ONLY on seconds — Spark's INTERVAL parser rejects them on
# every other unit (INVALID_INTERVAL_FORMAT.INVALID_FRACTION), so
# accepting "1.5 hours" here would re-surface the Catalyst error this
# validator exists to prevent.
_INTERVAL_TERM = (
    r"(?:\d+\s+"
    r"(?:microsecond|millisecond|second|minute|hour|day|week|month|year)s?"
    r"|\d+\.\d+\s+seconds?)"
)
_INTERVAL_RE = re.compile(
    rf"^\s*{_INTERVAL_TERM}(?:\s+{_INTERVAL_TERM})*\s*$",
    re.IGNORECASE,
)


def _validate_interval(tolerance: str) -> str:
    if not isinstance(tolerance, str) or not _INTERVAL_RE.match(tolerance):
        raise ValueError(
            f"tolerance must be an INTERVAL string like '2 hours' or "
            f"'1 day 30 minutes', got: {tolerance!r}"
        )
    return tolerance


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_ts_col: Optional[str] = None,
    payload_cols: Optional[Sequence[str]] = None,
    suffix: str = "_asof",
    tolerance: Optional[str] = None,
) -> DataFrame:
    """Backward (inclusive) as-of join.

    Every ``left`` row gains, for each payload column ``c`` of
    ``right``, a column ``c + suffix`` holding the value from the
    latest ``right`` row of the same ``on`` key with
    ``right_ts <= left_ts`` — NULL when no such row exists (left
    rows are always kept), plus ``matched_ts + suffix`` with that
    row's timestamp.

    ``tolerance`` (an INTERVAL string, e.g. ``"2 hours"``) bounds
    staleness: matches older than ``left_ts - tolerance`` are
    discarded (payload NULLed), mirroring pandas ``merge_asof``.

    Ties: right rows sharing an identical (key, ts) are ambiguous —
    deduplicate upstream (e.g. ``groupBy(key, ts).agg(...)``) if the
    input allows them; the window keeps the last in an unspecified
    order among exact duplicates, like any engine's as-of.

    NULLs: NULL join keys never match (SQL join semantics — NULL-key
    left rows are kept with NULL payload; NULL-key right rows are
    dropped), and rows without a timestamp cannot be ordered — a
    NULL-ts left row gets NULL payload (it sorts before every right
    row), NULL-ts right rows are dropped.
    """
    on = list(on)
    if tolerance is not None:
        tolerance = _validate_interval(tolerance)
    rts = right_ts_col or ts_col
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in on and c != rts]
    payload_cols = list(payload_cols)

    # JOIN semantics on NULL keys: a NULL key never equals anything, so
    # right rows with any NULL key component can match nothing — drop
    # them BEFORE the union (without this, Window.partitionBy would
    # group NULL keys together and enrich NULL-key left rows from
    # NULL-key right rows, which no SQL join / merge_asof / ASOF JOIN
    # would do).  NULL-key left rows are still kept, with NULL payload:
    # they partition among themselves and find no right rows.
    key_not_null = F.lit(True)
    for c in on:
        key_not_null = key_not_null & F.col(c).isNotNull()
    right = right.where(key_not_null & F.col(rts).isNotNull())

    packed = F.struct(
        F.col(rts).alias("_matched_ts"),
        *[F.col(c) for c in payload_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),  # rights sort first at equal ts
        packed.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_m", F.last("_p", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m._matched_ts")
                >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}"),
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col("_m._matched_ts").alias(f"matched_ts{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
