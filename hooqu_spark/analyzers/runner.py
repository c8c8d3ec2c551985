"""Analysis runner: compiles an analyzer set into a minimal number of
Spark jobs.

Where the reference runs analyzers sequentially, one pandas ``agg``
each (``hooqu/analyzers/runners/analysis_runner.py:150-170``), this
runner re-enables the scan-sharing design the reference left dormant
(``analysis_runner.py:173-230``) — on Spark it is the whole point:

* job 1 — ONE ``df.agg(e1..eN)`` computing every scan-shareable
  analyzer (Size/Completeness/Min/Max/Sum/Mean/StdDev/Compliance/
  PatternMatch/ApproxQuantile/...) plus the phase-1 counts of exact
  Quantile analyzers.  Catalyst executes it as partial+final hash
  aggregation with whole-stage codegen; differently-``where``'d
  analyzers coexist via conditional aggregates.
* job 2 — (only if exact Quantiles present) one ``df.agg`` of
  ``percentile`` expressions at nearest-rank-adjusted fractions.
* one groupBy job per distinct (grouping_columns, where) pair, shared
  by all frequency-based analyzers on that pair.

Precondition failures and unresolvable expressions become per-analyzer
``Failure`` metrics without poisoning the fused job.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame

from ..metrics import DoubleMetric, Entity, Metric
from .analyzers import Quantile
from .base import (
    Analyzer,
    ScanShareableAnalyzer,
    apply_projections,
    find_first_failing,
)
from .grouping import FrequencyBasedAnalyzer


@dataclass
class AnalyzerContext:
    metric_map: Dict[Analyzer, Metric] = field(default_factory=dict)

    def all_metrics(self) -> List[Metric]:
        return list(self.metric_map.values())

    def __add__(self, other: "AnalyzerContext") -> "AnalyzerContext":
        return AnalyzerContext({**self.metric_map, **other.metric_map})

    def metric(self, analyzer: Analyzer) -> Optional[Metric]:
        return self.metric_map.get(analyzer, None)

    @staticmethod
    def success_metrics_as_dataframe(
        analyzer_context: "AnalyzerContext",
        for_analyzers: Sequence[Analyzer] = (),
    ) -> pd.DataFrame:
        mm = analyzer_context.metric_map

        def relevant(analyzer: Analyzer, metric: Metric) -> bool:
            return (
                not for_analyzers or analyzer in for_analyzers
            ) and metric.value.isSuccess

        rows = [
            (
                str(metric.entity).split(".")[-1],
                metric.instance,
                metric.name,
                float(metric.value.get()),
            )
            for analyzer, metric in mm.items()
            if relevant(analyzer, metric)
        ]
        return pd.DataFrame(
            rows, columns=("entity", "instance", "name", "value")
        )


def do_analysis_run(
    data: DataFrame, analyzers: Sequence[Analyzer]
) -> AnalyzerContext:
    """Compute metrics for all analyzers with minimal Spark jobs."""
    if not analyzers:
        return AnalyzerContext({})

    # Deduplicate (order-preserving; identity includes name, columns,
    # where, and per-type extras — fixing the reference's __eq__ bugs).
    unique: Dict[Analyzer, None] = {}
    for a in analyzers:
        unique.setdefault(a, None)
    todo = list(unique)

    metrics: Dict[Analyzer, Metric] = {}

    # 1. Preconditions (schema-only, no jobs).
    schema = data.schema
    passed: List[Analyzer] = []
    for a in todo:
        err = find_first_failing(schema, a.preconditions())
        if err is not None:
            metrics[a] = a.to_failure_metric(err)
        else:
            passed.append(a)

    scan: List[ScanShareableAnalyzer] = []
    quantiles: List[Quantile] = []
    grouping: List[FrequencyBasedAnalyzer] = []
    others: List[Analyzer] = []
    for a in passed:
        if isinstance(a, Quantile):
            quantiles.append(a)
        elif isinstance(a, ScanShareableAnalyzer) and a.fuses_into_scan:
            scan.append(a)
        elif isinstance(a, FrequencyBasedAnalyzer):
            grouping.append(a)
        else:
            others.append(a)

    # 2. Fused single-scan aggregation (over shared derived columns —
    #    expensive per-row classifications evaluated once, see
    #    ScanShareableAnalyzer.projection_cols).
    agg_input = apply_projections(data, scan)
    fused: List[Tuple[Analyzer, int, int]] = []  # (analyzer, start, end)
    exprs = []
    for a in scan:
        try:
            ae = a.cached_aggregation_exprs(agg_input)
        except Exception as e:  # unresolvable expression -> Failure
            metrics[a] = a.to_failure_metric(e)
            continue
        fused.append((a, len(exprs), len(exprs) + len(ae)))
        exprs.extend(ae)
    q_offsets: List[Tuple[Quantile, int]] = []
    for q in quantiles:
        try:
            qe = q.phase1_exprs(data)
        except Exception as e:
            metrics[q] = q.to_failure_metric(e)
            continue
        q_offsets.append((q, len(exprs)))
        exprs.extend(qe)

    if exprs:
        # no aliases: the row is consumed positionally, and each
        # .alias() is a py4j round trip (54 exprs ~= 0.1s of driver
        # time per fused run)
        row = list(agg_input.agg(*exprs).first())
        for a, start, end in fused:
            try:
                state = a.state_from_agg(row[start:end])
                metrics[a] = a.compute_metric_from(state)
            except Exception as e:  # noqa: BLE001
                metrics[a] = a.to_failure_metric(e)

        # 3. Exact quantiles: phase 2 (one more fused job).  Quantiles
        #    sharing a (column, where) pair fuse into ONE
        #    percentile(col, array(q1..qk)) — a single sort buffer per
        #    group instead of one full-column buffer per quantile.
        by_col: Dict[
            Tuple[str, Optional[str]], List[Tuple[Quantile, int]]
        ] = {}
        for q, off in q_offsets:
            n = int(row[off] or 0)
            if n == 0:
                try:
                    metrics[q] = q.compute_metric_from(q.state_from_phases(0, None))
                except Exception as e:  # noqa: BLE001
                    metrics[q] = q.to_failure_metric(e)
                continue
            by_col.setdefault((q.instance, q.where), []).append((q, n))
        groups = list(by_col.values())
        if groups:
            q_row = list(
                data.agg(
                    *(
                        Quantile.fused_phase2_expr(data, g).alias(f"_q{i}")
                        for i, g in enumerate(groups)
                    )
                ).first()
            )
            for g, values in zip(groups, q_row):
                for j, (q, n) in enumerate(g):
                    try:
                        value = None if values is None else values[j]
                        state = q.state_from_phases(n, value)
                        metrics[q] = q.compute_metric_from(state)
                    except Exception as e:  # noqa: BLE001
                        metrics[q] = q.to_failure_metric(e)

    # 4. Grouping analyzers: one groupBy job per (columns, where) pair,
    #    shared across all frequency-based analyzers on that pair.
    by_group: Dict[Tuple[Tuple[str, ...], Optional[str]], List[FrequencyBasedAnalyzer]] = {}
    for g in grouping:
        by_group.setdefault(
            (tuple(g.grouping_columns), g.where), []
        ).append(g)
    for (cols, where), group_analyzers in by_group.items():
        try:
            state = FrequencyBasedAnalyzer.compute_frequencies(
                data, list(cols), where
            )
            stats = None
            if any(not g.uses_full_frequencies for g in group_analyzers):
                stats = FrequencyBasedAnalyzer.frequency_stats(state.frequencies)
        except Exception as e:  # noqa: BLE001
            for g in group_analyzers:
                metrics[g] = g.to_failure_metric(e)
            continue
        for g in group_analyzers:
            try:
                if g.uses_full_frequencies:
                    metrics[g] = g.compute_metric_from(state)
                else:
                    metrics[g] = g.metric_from_stats(*stats)
            except Exception as e:  # noqa: BLE001
                metrics[g] = g.to_failure_metric(e)

    # 5. Anything else: standalone calculate.
    for a in others:
        metrics[a] = a.calculate(data)

    # Preserve input analyzer order in the context.
    ordered = {a: metrics[a] for a in todo if a in metrics}
    return AnalyzerContext(ordered)
