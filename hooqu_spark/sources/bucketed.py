"""Bucketed-table storage: co-located joins and aggregations.

At 100 TB the dominant cost of a repeated key-join (documents ⋈
fingerprints, events ⋈ sessions, corpus ⋈ dedup-survivors) is the
shuffle of the fat side — every run, forever.  Spark's table bucketing
pays that shuffle ONCE at write time: a table written with
``bucketBy(n, key)`` is stored pre-hash-partitioned on the key, and
every later equi-join or aggregation on that key between co-bucketed
tables (same key, same bucket count) plans with NO exchange on either
side — the scan itself satisfies the distribution requirement.

This is the storage-level complement to the runtime strategies used
elsewhere in this package (broadcast for small dims, salting for skew,
AQE for re-planning): bucket the tables you join every day, broadcast
the ones that fit in memory, salt the keys that are hot.

Sandbox notes: bucketing metadata lives in the session catalog, so
these helpers go through ``saveAsTable`` (with an explicit ``path`` the
table is EXTERNAL — data outlives the catalog entry and the session).
Hive is not required; Spark's in-memory/derby session catalog carries
bucket specs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed on ``bucket_cols`` into
    ``n_buckets`` buckets (optionally sorted within buckets, which
    additionally removes the sort from future sort-merge joins).

    Pick ``n_buckets`` like shuffle partitions: 2-4x the total
    executor cores that will later JOIN the table, and the SAME count
    for every table that joins on this key — equal bucket counts are
    what lets Catalyst drop both exchanges.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    ``spark.read.parquet(path)`` of the same files would lose it and
    reintroduce the shuffle)."""
    return spark.table(table)
