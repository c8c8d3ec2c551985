"""Structured Streaming verification: incremental metric states over a
stream.

The reference planned incremental metric computation but never built it
(``README.rst:154-156``, stubbed ``aggregate_with`` hooks).  On Spark
the monoid states make it natural: each micro-batch contributes one
fused-scan state vector; the accumulator folds batches with the same
merge ops the lineage layer uses, so cumulative metrics after N batches
equal the metrics of the concatenated data — without reprocessing.

Only scan-shareable analyzers participate (grouping analyzers would
need their frequency tables persisted per batch — use the batch
pipeline's lineage path for those).

Usage::

    acc = StreamingVerification(analyzers, checks)
    q = acc.attach(stream_df).start()
    ...
    acc.current_metrics()     # cumulative across all processed batches
    acc.last_result           # VerificationResult of the latest batch
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

from .analyzers.base import Analyzer, ScanShareableAnalyzer
from .analyzers.runner import AnalyzerContext
from .checks import Check
from .lineage import analyzer_key
from .metrics import DoubleMetric
from .states import State
from .verification_suite import VerificationResult, VerificationSuite


class StreamingVerification:
    def __init__(
        self,
        analyzers: Sequence[ScanShareableAnalyzer],
        checks: Sequence[Check] = (),
        on_batch: Optional[Callable[[int, VerificationResult], None]] = None,
    ):
        for a in analyzers:
            if not isinstance(a, ScanShareableAnalyzer):
                raise TypeError(
                    f"streaming verification requires scan-shareable "
                    f"analyzers, got {a!r}"
                )
        self.analyzers = list(analyzers)
        self.checks = list(checks)
        self.on_batch = on_batch
        self._lock = threading.Lock()
        self._states: Dict[str, Optional[State]] = {}
        self._batches = 0
        self.last_result: Optional[VerificationResult] = None

    # -- state folding -------------------------------------------------------
    def _fold_batch(self, batch_df: DataFrame) -> None:
        slices = []
        exprs = []
        for a in self.analyzers:
            ae = a.aggregation_exprs(batch_df)
            slices.append((a, len(exprs), len(exprs) + len(ae)))
            exprs.extend(ae)
        row = list(
            batch_df.agg(
                *(e.alias(f"_b{i}") for i, e in enumerate(exprs))
            ).first()
        )
        with self._lock:
            for a, start, end in slices:
                key = analyzer_key(a)
                try:
                    state = a.state_from_agg(row[start:end])
                except Exception:
                    state = None
                prev = self._states.get(key)
                if prev is None:
                    self._states[key] = state
                elif state is not None:
                    self._states[key] = prev.sum(state)
            self._batches += 1

    def current_metrics(self) -> Dict[Analyzer, DoubleMetric]:
        with self._lock:
            out: Dict[Analyzer, DoubleMetric] = {}
            for a in self.analyzers:
                state = self._states.get(analyzer_key(a))
                try:
                    out[a] = a.compute_metric_from(state)
                except Exception as e:  # noqa: BLE001
                    out[a] = a.to_failure_metric(e)
            return out

    def batches_processed(self) -> int:
        with self._lock:
            return self._batches

    # -- foreachBatch glue -----------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._fold_batch(batch_df)
        metrics = self.current_metrics()
        ctx = AnalyzerContext(dict(metrics))
        result = VerificationSuite().evaluate(self.checks, ctx)
        self.last_result = result
        if self.on_batch is not None:
            self.on_batch(batch_id, result)

    def attach(self, stream_df: DataFrame):
        """Return a DataStreamWriter with foreachBatch wired; caller
        sets trigger/checkpoint and calls .start()."""
        return stream_df.writeStream.foreachBatch(self.process_batch)
