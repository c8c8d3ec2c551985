"""hooqu-spark: a PySpark-native data-quality verification engine.

From-scratch rebuild of the capabilities of mfcabrera/hooqu ("unit
tests for data", a pandas port of AWS Deequ / the VLDB'18 paper
"Automating large-scale data quality verification") as distributed
Spark DataFrame aggregations with mergeable (monoid) metric states,
plus a web-text quality-filter pipeline (language ID, perplexity,
Gopher/C4 heuristics, regex PII scrub) gated and instrumented by
those metrics.
"""

__version__ = "0.1.0"

from .anomaly import (
    AbsoluteChangeStrategy,
    Anomaly,
    AnomalyCheck,
    AnomalyStrategy,
    MeanDeviationStrategy,
    HoltWintersStrategy,
    RelativeRateOfChangeStrategy,
    SimpleThresholdStrategy,
    detect_anomaly,
    run_with_anomaly_checks,
)
from .checks import Check, CheckLevel, CheckResult, CheckStatus, is_one
from .metrics import DoubleMetric, Entity, Failure, Metric, Success
from .profiler import (
    ColumnProfile,
    ConstraintSuggestion,
    numeric_histogram,
    profile_columns,
    suggest_constraints,
    suggested_check,
)
from .repository import MetricsRepository
from .streaming import StreamingVerification, WindowedMetrics
from .verification_suite import (
    VerificationResult,
    VerificationRunBuilder,
    VerificationSuite,
)

__all__ = [
    "AbsoluteChangeStrategy",
    "Anomaly",
    "AnomalyCheck",
    "AnomalyStrategy",
    "Check",
    "ColumnProfile",
    "ConstraintSuggestion",
    "MeanDeviationStrategy",
    "MetricsRepository",
    "HoltWintersStrategy",
    "RelativeRateOfChangeStrategy",
    "SimpleThresholdStrategy",
    "StreamingVerification",
    "WindowedMetrics",
    "detect_anomaly",
    "numeric_histogram",
    "profile_columns",
    "run_with_anomaly_checks",
    "suggest_constraints",
    "suggested_check",
    "CheckLevel",
    "CheckResult",
    "CheckStatus",
    "DoubleMetric",
    "Entity",
    "Failure",
    "Metric",
    "Success",
    "VerificationResult",
    "VerificationRunBuilder",
    "VerificationSuite",
    "is_one",
]
