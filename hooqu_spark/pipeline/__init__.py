from .core import (
    PipelineResult,
    apply_rules,
    enrich,
    gating_checks,
    lineage_analyzers,
    run_pipeline,
    streaming_quality_filter,
)
from .spec import DEFAULT_RULES, RuleSet
from .synth import make_doc, make_docs_pdf, synthesize

__all__ = [
    "DEFAULT_RULES",
    "PipelineResult",
    "RuleSet",
    "apply_rules",
    "enrich",
    "gating_checks",
    "lineage_analyzers",
    "make_doc",
    "make_docs_pdf",
    "run_pipeline",
    "streaming_quality_filter",
    "synthesize",
]
