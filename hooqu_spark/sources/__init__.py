"""Table sources: snapshot-aware readers for incremental ingestion.

The north-rule deployment reads Common-Crawl-style pages from Apache
Iceberg tables and checkpoints analyzer states per Iceberg snapshot.
This package provides that integration behind a small protocol so the
same ingestion loop runs in-sandbox (no Iceberg runtime jar) against a
directory-of-batches fallback:

* :class:`IcebergSnapshotSource` — real Iceberg: snapshot ids from the
  ``<table>.snapshots`` metadata table, deltas via incremental reads
  (``start-snapshot-id``/``end-snapshot-id``).  Requires the Iceberg
  Spark runtime on the classpath (``iceberg_available``).
* :class:`ParquetBatchSource` — fallback with identical semantics:
  "snapshots" are immutable batch subdirectories of a root path.
* :func:`ingest_snapshots` — folds every not-yet-committed snapshot
  into a run's mergeable metric states via
  :func:`hooqu_spark.lineage.incremental_metrics` (one groupBy job per
  new snapshot, idempotent under retries and re-listing).
"""

from .bucketed import read_bucketed, write_bucketed
from .snapshots import (
    IcebergSnapshotSource,
    ParquetBatchSource,
    iceberg_available,
    ingest_snapshots,
    read_pages,
)

__all__ = [
    "IcebergSnapshotSource",
    "ParquetBatchSource",
    "iceberg_available",
    "ingest_snapshots",
    "read_bucketed",
    "read_pages",
    "write_bucketed",
]
