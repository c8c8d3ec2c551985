"""Webtext quality pipeline: enrich -> rules -> gate -> scrub -> lineage.

Execution design (Spark-first, 100TB-minded):

* **enrich** — ONE Arrow-batched ``pandas_udf`` returning a struct of
  all features + scrubbed text.  Only the ``text`` column crosses the
  Arrow boundary; ``html`` (the fat binary column) never leaves the
  JVM and is dropped before the checkpoint write (column pruning).
* **rules** — pure Catalyst column expressions over the feature
  struct (JVM-side, whole-stage codegen); ``keep`` is their
  conjunction.  Each rule is also a named boolean column so pass
  fractions materialize as Compliance metrics.
* **bucketing** — ``pmod(xxhash64(url), n_buckets)`` spreads hot hosts
  uniformly (hash-salting the skewed host key); the bucket is the
  checkpoint/resume unit and the lineage partition key.
* **checkpoint** — the enriched table is written once, partitioned by
  bucket with dynamic partition overwrite (idempotent re-runs); the
  per-bucket analyzer states committed to the ``StateRepository`` are
  the "done" marker.  A killed run resumes by processing only
  uncommitted buckets.
* **metrics** — per-bucket monoid states (lineage) merge to global
  metrics; a gating ``VerificationSuite`` evaluates Checks on the
  checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..analyzers import (
    Completeness,
    Compliance,
    Maximum,
    Mean,
    Minimum,
    QuantileSketch,
    ScanShareableAnalyzer,
    Size,
    StandardDeviation,
    Sum,
)
from ..checks import Check, CheckLevel
from ..lineage import StateRepository, compute_partition_states, metrics_from_states, merge_states
from ..metrics import DoubleMetric
from ..verification_suite import VerificationResult, VerificationSuite
from .features import compute_doc_features
from .spec import FEATURE_FIELDS, DEFAULT_RULES, RuleSet

_SPARK_TYPES = {"int": T.IntegerType(), "double": T.DoubleType(), "string": T.StringType()}

FEATURES_STRUCT = T.StructType(
    [T.StructField(n, _SPARK_TYPES[t], True) for n, t in FEATURE_FIELDS]
)


def _features_udf():
    names = [n for n, _ in FEATURE_FIELDS]

    @pandas_udf(FEATURES_STRUCT)
    def featurize(texts: pd.Series) -> pd.DataFrame:
        feats = [compute_doc_features(t) for t in texts.tolist()]
        # column-wise construction: pd.DataFrame(list-of-dicts) re-infers
        # keys per row and is measurably slower per Arrow batch
        return pd.DataFrame(
            {n: [f[n] for f in feats] for n in names}, columns=names
        )

    return featurize


def enrich(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append all feature columns in a single vectorized UDF pass.

    Performance: drop fat columns (e.g. ``html`` binary) BEFORE calling
    this — Catalyst does not prune columns through the Python eval
    node, so every column still in the plan is decoded and carried
    alongside the UDF (measured 2.4x slowdown with a 1KB binary kept).
    """
    featurize = _features_udf()
    tmp = df.withColumn("_features", featurize(F.col(text_col)))
    return tmp.select("*", "_features.*").drop("_features")


def rule_exprs(rules: RuleSet) -> Dict[str, F.Column]:
    """Named boolean rule columns (pure Catalyst expressions)."""
    c = F.col
    return {
        "rule_n_words": c("n_words").between(rules.min_words, rules.max_words),
        "rule_mean_word_length": c("mean_word_length").between(
            rules.min_mean_word_length, rules.max_mean_word_length
        ),
        "rule_symbol_ratio": c("symbol_to_word_ratio")
        <= rules.max_symbol_to_word_ratio,
        "rule_bullet_lines": c("bullet_line_frac") <= rules.max_bullet_line_frac,
        "rule_ellipsis_lines": c("ellipsis_line_frac")
        <= rules.max_ellipsis_line_frac,
        "rule_alpha_words": c("alpha_word_frac") >= rules.min_alpha_word_frac,
        "rule_stopwords": c("stopword_frac") >= rules.min_stopword_frac,
        "rule_top2gram": c("top2gram_frac") <= rules.max_top2gram_frac,
        "rule_top3gram": c("top3gram_frac") <= rules.max_top3gram_frac,
        "rule_dup5gram": c("dup5gram_frac") <= rules.max_dup5gram_frac,
        "rule_lang": (c("lang_pred") == rules.target_lang)
        & (c("lang_score") >= rules.min_lang_score),
        "rule_ppl": c("log_ppl") <= rules.max_log_ppl,
    }


def apply_rules(enriched: DataFrame, rules: RuleSet = DEFAULT_RULES) -> DataFrame:
    out = enriched
    exprs = rule_exprs(rules)
    for name, expr in exprs.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in exprs:
        keep = F.col(name) if keep is None else (keep & F.col(name))
    return out.withColumn("keep", keep)


def lineage_analyzers(rules: RuleSet = DEFAULT_RULES) -> List[ScanShareableAnalyzer]:
    """Scan-shareable analyzers materialized as per-bucket states."""
    ans: List[ScanShareableAnalyzer] = [
        Size(),
        Completeness("text"),
        Completeness("scrubbed_text"),
        Minimum("n_words"),
        Maximum("n_words"),
        Mean("n_words"),
        Mean("log_ppl"),
        StandardDeviation("log_ppl"),
        QuantileSketch("log_ppl", 0.5),
        Sum("n_emails"),
        Sum("n_creditcards"),
        Sum("n_toxic"),
        Compliance("keep_rate", "keep == true"),
    ]
    for rule_name in rules.rule_names():
        ans.append(Compliance(f"{rule_name}_rate", f"{rule_name} == true"))
    return ans


def gating_checks(rules: RuleSet = DEFAULT_RULES,
                  min_keep_rate: float = 0.05) -> List[Check]:
    """Quality gates evaluated on the enriched checkpoint."""
    return [
        (
            Check(CheckLevel.ERROR, "input integrity")
            .has_size(lambda n: n > 0)
            .is_complete("url")
            .is_unique("url")
            .is_complete("text")
            .is_complete("scrubbed_text")
        ),
        (
            Check(CheckLevel.ERROR, "pipeline sanity")
            .is_non_negative("n_words")
            .is_non_negative("log_ppl")
            .satisfies("keep == true", "keep rate", lambda v: v >= min_keep_rate)
        ),
        (
            Check(CheckLevel.WARNING, "scrub coverage")
            .satisfies(
                "n_emails == 0 or not (scrubbed_text rlike "
                "'[a-z0-9._%+-]+@[a-z0-9.-]+')",
                "emails redacted",
            )
        ),
    ]


@dataclass
class PipelineResult:
    kept: DataFrame
    enriched: DataFrame
    verification: VerificationResult
    metrics: Dict
    processed_buckets: List[str]
    resumed_buckets: List[str]


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    work_dir: str,
    rules: RuleSet = DEFAULT_RULES,
    run_id: str = "run",
    n_buckets: int = 64,
    resume: bool = True,
) -> PipelineResult:
    """End-to-end gated pipeline with checkpoint/resume.

    Commit protocol: (1) enriched bucket partitions written with
    dynamic partition overwrite (idempotent), (2) bucket states
    committed to the StateRepository (the durable "done" marker).
    Crash between (1) and (2) -> bucket is reprocessed and its
    partition overwritten; no duplicates, no loss.
    """
    repo = StateRepository(f"{work_dir}/states")
    enriched_dir = f"{work_dir}/enriched/{run_id}"
    analyzers = lineage_analyzers(rules)

    committed = repo.committed_buckets(run_id) if resume else []

    bucketed = pages.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("string")
    )
    todo = bucketed
    if committed:
        todo = bucketed.where(~F.col("bucket").isin(committed))

    processed: List[str] = []
    if todo.limit(1).count() > 0:
        # Drop the fat binary column BEFORE the Arrow UDF stage:
        # Catalyst does not prune columns through the Python eval node,
        # so anything still in the plan is decoded and carried (2.4x
        # slower measured with html kept).
        enriched_new = apply_rules(enrich(todo.drop("html")), rules)
        (
            enriched_new.write.partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(enriched_dir)
        )
        checkpoint = spark.read.parquet(enriched_dir)
        new_buckets = [
            r[0]
            for r in checkpoint.select("bucket").distinct().collect()
            if str(r[0]) not in committed
        ]
        fresh = checkpoint.where(F.col("bucket").isin([str(b) for b in new_buckets]))
        records = compute_partition_states(fresh, analyzers, "bucket")
        repo.save(run_id, records)
        processed = sorted(str(b) for b in new_buckets)

    checkpoint = spark.read.parquet(enriched_dir)
    merged = merge_states(repo.load(run_id))
    metrics = metrics_from_states(analyzers, merged)
    verification = (
        VerificationSuite().on_data(checkpoint).add_checks(gating_checks(rules)).run()
    )
    kept = checkpoint.where(F.col("keep"))
    return PipelineResult(
        kept=kept,
        enriched=checkpoint,
        verification=verification,
        metrics=metrics,
        processed_buckets=processed,
        resumed_buckets=sorted(committed),
    )


def streaming_quality_filter(
    stream_df: DataFrame,
    rules: RuleSet = DEFAULT_RULES,
    text_col: str = "text",
) -> DataFrame:
    """The quality pipeline as a STREAMING transformation: enrich (the
    same single-pass Arrow UDF — stateless, so it runs unchanged inside
    micro-batches) -> Catalyst rule columns -> keep-filter.

    Returns a streaming DataFrame of kept rows with all feature/rule
    columns; the caller picks sink/trigger/checkpoint::

        kept = streaming_quality_filter(spark.readStream.schema(s).parquet(src))
        q = (kept.writeStream.format("parquet")
                 .option("path", out).option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())

    Pair with :class:`hooqu_spark.streaming.StreamingVerification` (on
    the same source) for cumulative quality metrics, or
    ``WindowedMetrics`` keyed on ``warc_ts`` for event-time windows
    with late-data handling.  Exactly-once delivery comes from the
    sink checkpoint; determinism of every feature column (hash-based
    kernels, no rand) makes replayed batches byte-identical.
    """
    enriched = apply_rules(enrich(stream_df, text_col=text_col), rules)
    return enriched.where(F.col("keep"))
