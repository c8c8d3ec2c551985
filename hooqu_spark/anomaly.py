"""Anomaly detection over metric history (Deequ-style
``addAnomalyCheck``; absent from the reference, part of the Deequ
surface it mirrors — see deequ's ``anomalydetection`` package for the
strategy taxonomy).

A strategy decides whether the *latest* value of a metric time series
is anomalous given its history.  ``AnomalyCheck`` binds a strategy to
an analyzer; ``run_with_anomaly_checks`` computes the current metrics
(one fused scan via the normal runner), evaluates every anomaly check
against the history in a ``MetricsRepository``, appends the current
values to the repository, and folds the verdicts into the returned
``VerificationResult`` as an extra check.

Everything here is driver-side pure Python over tiny metric tables —
no Spark jobs beyond the one metric computation.
"""

from __future__ import annotations

import math
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

from .analyzers.base import Analyzer
from .analyzers.runner import AnalyzerContext, do_analysis_run
from .checks import Check, CheckLevel, CheckResult, CheckStatus
from .constraints import ConstraintResult, ConstraintStatus
from .repository import MetricsRepository
from .verification_suite import VerificationResult, VerificationSuite


@dataclass(frozen=True)
class Anomaly:
    value: float
    is_anomaly: bool
    detail: str


class AnomalyStrategy(ABC):
    """Decides if ``current`` is anomalous given ``history`` (ordered
    oldest -> newest, not including ``current``)."""

    @abstractmethod
    def detect(self, history: Sequence[float], current: float) -> Anomaly:
        ...


@dataclass(frozen=True)
class SimpleThresholdStrategy(AnomalyStrategy):
    """Anomalous outside [lower_bound, upper_bound] (history ignored)."""

    lower_bound: float = -math.inf
    upper_bound: float = math.inf

    def detect(self, history: Sequence[float], current: float) -> Anomaly:
        bad = not (self.lower_bound <= current <= self.upper_bound)
        return Anomaly(
            current,
            bad,
            f"value {current} outside [{self.lower_bound}, {self.upper_bound}]"
            if bad
            else "within bounds",
        )


@dataclass(frozen=True)
class AbsoluteChangeStrategy(AnomalyStrategy):
    """Anomalous if current - previous falls outside
    [max_decrease, max_increase] (deequ: AbsoluteChangeStrategy)."""

    max_decrease: float = -math.inf
    max_increase: float = math.inf

    def detect(self, history: Sequence[float], current: float) -> Anomaly:
        if not history:
            return Anomaly(current, False, "no history; first value accepted")
        delta = current - history[-1]
        bad = not (self.max_decrease <= delta <= self.max_increase)
        return Anomaly(
            current,
            bad,
            f"change {delta:+g} vs previous {history[-1]} outside"
            f" [{self.max_decrease}, {self.max_increase}]"
            if bad
            else f"change {delta:+g} within bounds",
        )


@dataclass(frozen=True)
class RelativeRateOfChangeStrategy(AnomalyStrategy):
    """Anomalous if current/previous falls outside
    [max_rate_decrease, max_rate_increase] (deequ:
    RelativeRateOfChangeStrategy)."""

    max_rate_decrease: float = 0.0
    max_rate_increase: float = math.inf

    def detect(self, history: Sequence[float], current: float) -> Anomaly:
        if not history:
            return Anomaly(current, False, "no history; first value accepted")
        prev = history[-1]
        if prev == 0:
            rate = math.inf if current != 0 else 1.0
        else:
            rate = current / prev
        bad = not (self.max_rate_decrease <= rate <= self.max_rate_increase)
        return Anomaly(
            current,
            bad,
            f"rate {rate:g} vs previous {prev} outside"
            f" [{self.max_rate_decrease}, {self.max_rate_increase}]"
            if bad
            else f"rate {rate:g} within bounds",
        )


@dataclass(frozen=True)
class MeanDeviationStrategy(AnomalyStrategy):
    """Anomalous if |current - mean(history)| > k * stddev(history)
    (deequ: BatchNormalStrategy / OnlineNormalStrategy family).
    Requires at least ``min_history`` points; accepts until then."""

    k: float = 3.0
    min_history: int = 3

    def detect(self, history: Sequence[float], current: float) -> Anomaly:
        clean = [v for v in history if not math.isnan(v)]
        if len(clean) < self.min_history:
            return Anomaly(
                current,
                False,
                f"history {len(clean)} < min_history {self.min_history};"
                " accepted",
            )
        n = len(clean)
        mean = sum(clean) / n
        var = sum((v - mean) ** 2 for v in clean) / n
        std = math.sqrt(var)
        dev = abs(current - mean)
        bad = dev > self.k * std
        return Anomaly(
            current,
            bad,
            f"|{current} - mean {mean:g}| = {dev:g} "
            + (f"> {self.k}*stddev {std:g}" if bad else
               f"<= {self.k}*stddev {std:g}"),
        )


@dataclass(frozen=True)
class HoltWintersStrategy(AnomalyStrategy):
    """Seasonal forecast anomaly detection (deequ: HoltWinters):
    additive Holt-Winters (level + trend + seasonality of period
    ``season_length``) fit over the history, one-step forecast compared
    to the current value, flagged when the residual exceeds
    ``k`` x the stddev of the in-sample one-step forecast errors.

    Daily metrics with a weekly rhythm use ``season_length=7``; hourly
    with a daily rhythm 24.  Needs at least two full seasons of
    history; accepts until then.  Deterministic, driver-side, O(|history|).
    """

    season_length: int = 7
    alpha: float = 0.3   # level smoothing
    beta: float = 0.1    # trend smoothing
    gamma: float = 0.3   # seasonal smoothing
    k: float = 3.0
    min_sigma: float = 1e-9

    def detect(self, history: Sequence[float], current: float) -> Anomaly:
        m = self.season_length
        clean = [float(v) for v in history if not math.isnan(v)]
        if len(clean) < 2 * m:
            return Anomaly(
                current,
                False,
                f"history {len(clean)} < two seasons ({2 * m}); accepted",
            )
        # init from the first two seasons
        s0 = sum(clean[:m]) / m
        s1 = sum(clean[m : 2 * m]) / m
        level = s0
        trend = (s1 - s0) / m
        seasonal = [clean[i] - s0 for i in range(m)]
        errors: List[float] = []
        for t in range(m, len(clean)):
            forecast = level + trend + seasonal[t % m]
            errors.append(clean[t] - forecast)
            prev_level = level
            level = self.alpha * (clean[t] - seasonal[t % m]) + (
                1 - self.alpha
            ) * (level + trend)
            trend = self.beta * (level - prev_level) + (1 - self.beta) * trend
            seasonal[t % m] = (
                self.gamma * (clean[t] - level)
                + (1 - self.gamma) * seasonal[t % m]
            )
        forecast = level + trend + seasonal[len(clean) % m]
        n = len(errors)
        mean_err = sum(errors) / n
        sigma = math.sqrt(sum((e - mean_err) ** 2 for e in errors) / n)
        sigma = max(sigma, self.min_sigma)
        resid = abs(current - forecast)
        bad = resid > self.k * sigma
        return Anomaly(
            current,
            bad,
            f"forecast {forecast:g}, residual {resid:g} "
            + (f"> {self.k}*sigma {sigma:g}" if bad
               else f"<= {self.k}*sigma {sigma:g}"),
        )


@dataclass(frozen=True)
class AnomalyCheck:
    analyzer: Analyzer
    strategy: AnomalyStrategy
    level: CheckLevel = CheckLevel.WARNING
    description: str = ""


def _metric_history(
    repository: MetricsRepository, tag: str, analyzer: Analyzer
) -> List[float]:
    series = repository.diff(tag, analyzer.name, analyzer.instance)
    return [float(v) for v in series["value"].tolist()]


def detect_anomaly(
    repository: MetricsRepository,
    tag: str,
    analyzer: Analyzer,
    strategy: AnomalyStrategy,
    current: float,
) -> Anomaly:
    return strategy.detect(_metric_history(repository, tag, analyzer), current)


def run_with_anomaly_checks(
    data: DataFrame,
    checks: Sequence[Check],
    anomaly_checks: Sequence[AnomalyCheck],
    repository: MetricsRepository,
    tag: str,
    save_metrics: bool = True,
) -> VerificationResult:
    """Verification run + anomaly evaluation against metric history.

    One fused metric computation serves both the regular checks and the
    anomaly checks (their analyzers are added to the required set).
    Current metrics are appended to the repository AFTER evaluation, so
    the history a run is judged against never includes itself.
    """
    analyzers: List[Analyzer] = []
    seen = set()
    for c in checks:
        for a in c.required_analyzers():
            if a not in seen:
                seen.add(a)
                analyzers.append(a)
    for ac in anomaly_checks:
        if ac.analyzer not in seen:
            seen.add(ac.analyzer)
            analyzers.append(ac.analyzer)

    ctx = do_analysis_run(data, analyzers)
    result = VerificationSuite().evaluate(list(checks), ctx)

    anomaly_results: Dict[Check, CheckResult] = {}
    for i, ac in enumerate(anomaly_checks):
        metric = ctx.metric(ac.analyzer)
        desc = ac.description or (
            f"Anomaly check #{i} on {ac.analyzer!r} via"
            f" {type(ac.strategy).__name__}"
        )
        shell = Check(ac.level, desc)
        if metric is None or metric.value.isFailure:
            message = (
                "metric computation failed:"
                f" {metric.value.exception if metric else 'missing'}"
            )
            status = ConstraintStatus.FAILURE
            cr = ConstraintResult(None, status, message, metric)
        else:
            current = float(metric.value.get())
            verdict = detect_anomaly(
                repository, tag, ac.analyzer, ac.strategy, current
            )
            status = (
                ConstraintStatus.FAILURE
                if verdict.is_anomaly
                else ConstraintStatus.SUCCESS
            )
            cr = ConstraintResult(
                None, status, verdict.detail, metric
            )
        if status == ConstraintStatus.SUCCESS:
            check_status = CheckStatus.SUCCESS
        elif ac.level == CheckLevel.ERROR:
            check_status = CheckStatus.ERROR
        else:
            check_status = CheckStatus.WARNING
        anomaly_results[shell] = CheckResult(shell, check_status, (cr,))

    if save_metrics:
        repository.save(tag, ctx.metric_map)

    combined = dict(result.check_results)
    combined.update(anomaly_results)
    statuses = [cr.status for cr in combined.values()]
    overall = max(statuses) if statuses else CheckStatus.SUCCESS
    return VerificationResult(overall, combined, result.metrics)
