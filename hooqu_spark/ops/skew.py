"""Skew-resistant aggregation utilities.

Hot keys (a handful of hosts/domains holding a large share of a
web-scale corpus) make a plain ``groupBy(key)`` shuffle lopsided: one
reducer receives the hot key's entire traffic.  The classic fix is
**salting** — a two-phase aggregation::

    phase 1:  groupBy(key, salt)  -- hot key split across n_salts reducers
    phase 2:  groupBy(key)        -- tiny table of partial aggregates

which only works for aggregates with a merge step (monoids) — exactly
the property this engine's metric states already guarantee.

``salted_agg`` takes (partial_expr, merge_expr) pairs; convenience
wrappers cover the common count/sum/min/max cases.  AQE's skew-join
splitting handles the join side; this handles the aggregation side.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_hooqu_salt"


def _salt_col(n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts):
    ``xxhash64(monotonically_increasing_id)`` — partition id + row
    offset.  Row position alone is what splits hot keys (including
    rows repeated verbatim, common for hot keys in web corpora) while
    staying deterministic for a fixed input partitioning (task retries
    re-derive the same ids).  Deliberately does NOT hash the payload
    columns: on a documents table that would feed the full text (or a
    binary column) through the hash per row purely to derive a salt —
    wasted CPU at 100 TB, and it adds nothing the row position doesn't
    already provide."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Dict[str, Tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with a random salt.

    ``aggs`` maps output column name -> ``(partial_expr, merge_expr)``
    where ``partial_expr`` aggregates raw rows (phase 1) and
    ``merge_expr`` combines the per-salt partials by the SAME name
    (phase 2), e.g. ``{"n": (F.count(F.lit(1)), F.sum("n"))}``.

    ``F.rand``-free: the salt is ``pmod(xxhash64(partition_id +
    row_offset), n)`` — deterministic per row for a fixed input
    partitioning, so retried tasks salt identically (required for
    exactly-once under speculative execution).  Salting on row
    POSITION rather than column values matters because web corpora
    repeat hot rows verbatim: a value-derived salt would land every
    copy of a duplicated hot row on ONE salt, defeating the split this
    module exists for.
    """
    keys = list(keys)
    salt = _salt_col(n_salts)
    phase1 = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*(expr.alias(name) for name, (expr, _) in aggs.items()))
    )
    return phase1.groupBy(*keys).agg(
        *(merge.alias(name) for name, (_, merge) in aggs.items())
    )


def salted_counts(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16
) -> DataFrame:
    """Skew-safe ``groupBy(keys).count()`` (column name ``count``)."""
    return salted_agg(
        df,
        keys,
        {"count": (F.count(F.lit(1)), F.sum("count"))},
        n_salts,
    )


def salted_numeric_summary(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe per-key count/sum/min/max/mean of ``value_col``.

    Mean merges as (Σ partial sums)/(Σ partial counts) — the same
    MeanState monoid the metric layer uses."""
    c = F.col(value_col)
    out = salted_agg(
        df,
        keys,
        {
            "n": (F.count(c), F.sum("n")),
            "sum": (F.sum(c), F.sum("sum")),
            "min": (F.min(c), F.min("min")),
            "max": (F.max(c), F.max("max")),
        },
        n_salts,
    )
    return out.withColumn("mean", F.col("sum") / F.col("n"))


def salted_distinct_counts(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe ``groupBy(keys).agg(count_distinct(value_col))``
    (output column ``n_distinct``) — the aggregation where salting
    matters MOST: distinct counting has no map-side collapse (every
    (key, value) pair survives the partial phase), so a hot key ships
    its entire value set to ONE reducer in the plain plan.

    The salt here must be VALUE-stable — ``pmod(xxhash64(value), n)``
    — so every occurrence of a value lands in exactly one salt bucket
    and per-salt distinct counts add up without double counting
    (``_salt_col``'s row-position salt would split a value across
    buckets and overcount).  NULL values hash to a fixed bucket and are
    excluded by ``count_distinct``'s NULL semantics, matching the plain
    aggregate."""
    keys = list(keys)
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    phase1 = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(F.count_distinct(F.col(value_col)).alias("n_distinct"))
    )
    return phase1.groupBy(*keys).agg(
        F.sum("n_distinct").alias("n_distinct")
    )


def top_hot_keys(
    df: DataFrame, keys: Sequence[str], k: int = 20, n_salts: int = 16
) -> DataFrame:
    """The k heaviest key groups (skew diagnosis), computed skew-safely."""
    return (
        salted_counts(df, keys, n_salts)
        .orderBy(F.desc("count"), *list(keys))
        .limit(k)
    )


def cap_per_key(
    df: DataFrame,
    keys: Sequence[str],
    n: int,
    order_cols: Sequence[str],
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``n`` rows per key — the FIRST ``n`` in
    ``order_cols`` order — skew-safely.

    This is the standard bot/hot-host mitigation a web-scale corpus
    applies BEFORE per-key timeline work (sessionization, as-of
    enrichment, per-host stats): cap documents per domain, events per
    user per day, pages per crawl host.

    A plain ``row_number() over (partition by key)`` funnels the hot
    key's ENTIRE traffic through one reducer before discarding all but
    n rows.  This runs the classic two-phase top-n instead::

        phase 1:  window over (key, salt)  — each of n_salts reducers
                  keeps its n smallest, bounding any key at n*n_salts
        phase 2:  window over (key)        — exact n smallest of the
                  survivors

    The result is EXACT (phase 1 can only drop rows ranked > n within
    their salt bucket, which are rank > n globally too) and the hot
    key's reducer input shrinks from its full row count to
    ``n * n_salts``.  Determinism requires ``order_cols`` to be
    key-unique (add a tiebreaker id column if not — same contract as
    any top-n).
    """
    keys, order_cols = list(keys), list(order_cols)
    from pyspark.sql import Window

    order = [F.col(c).asc() for c in order_cols]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    w1 = Window.partitionBy(*keys, "_cap_salt").orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_cap_salt", salt)
        .withColumn("_cap_r1", F.row_number().over(w1))
        .where(F.col("_cap_r1") <= n)
        .withColumn("_cap_r2", F.row_number().over(w2))
        .where(F.col("_cap_r2") <= n)
        .drop("_cap_salt", "_cap_r1", "_cap_r2")
    )
