"""Column profiling + constraint suggestion (Deequ's
``ColumnProfilerRunner`` / ``ConstraintSuggestionRunner`` surface;
absent from the reference).

Pass structure mirrors Deequ's three-pass design, executed with this
engine's fused runner so each pass is ONE Spark job:

* pass 1 — generic + type-specific statistics for every profiled
  column in a single fused ``df.agg`` scan (completeness, approx
  distinct count, min/max/mean/stddev for numerics, min/max length +
  type inference for strings).
* pass 2 — (only for low-cardinality columns found in pass 1) exact
  value histograms, one shared ``groupBy`` job per column.

``suggest_constraints`` turns profiles into concrete, ready-to-run
constraint suggestions with human-readable rationale and a
``Check`` assembled from them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .analyzers import (
    ApproxCountDistinct,
    Completeness,
    DataTypeHistogram,
    Histogram,
    Maximum,
    MaxLength,
    Mean,
    Minimum,
    MinLength,
    Size,
    StandardDeviation,
    Uniqueness,
    do_analysis_run,
)
from .analyzers.base import Analyzer
from .checks import Check, CheckLevel


@dataclass
class ColumnProfile:
    column: str
    spark_type: str
    completeness: float
    approx_distinct: float
    is_numeric: bool = False
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    mean: Optional[float] = None
    stddev: Optional[float] = None
    is_string: bool = False
    min_length: Optional[float] = None
    max_length: Optional[float] = None
    inferred_type: Optional[str] = None
    type_fractions: Optional[Dict[str, float]] = None
    histogram: Optional[List[Tuple[str, int, float]]] = None
    uniqueness: Optional[float] = None
    looks_unique: bool = False


def _value(metric) -> Optional[float]:
    if metric is None or metric.value.isFailure:
        return None
    return float(metric.value.get())


def profile_columns(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    low_cardinality_threshold: int = 50,
    with_histograms: bool = True,
) -> Dict[str, ColumnProfile]:
    """Profile columns in (at most) two fused passes over the data."""
    schema = df.schema
    cols = list(columns) if columns is not None else df.columns

    analyzers: List[Analyzer] = [Size()]
    per_col: Dict[str, Dict[str, Analyzer]] = {}
    for c in cols:
        dtype = schema[c].dataType
        a: Dict[str, Analyzer] = {
            "completeness": Completeness(c),
            "distinct": ApproxCountDistinct(c),
        }
        if isinstance(dtype, (T.NumericType, T.BooleanType)):
            a.update(
                minimum=Minimum(c),
                maximum=Maximum(c),
                mean=Mean(c),
                stddev=StandardDeviation(c),
            )
        elif isinstance(dtype, T.StringType):
            a.update(min_length=MinLength(c), max_length=MaxLength(c))
        per_col[c] = a
        analyzers.extend(a.values())

    # pass 1: everything above fuses into one scan
    ctx = do_analysis_run(df, analyzers)

    profiles: Dict[str, ColumnProfile] = {}
    for c in cols:
        dtype = schema[c].dataType
        a = per_col[c]
        p = ColumnProfile(
            column=c,
            spark_type=dtype.simpleString(),
            completeness=_value(ctx.metric(a["completeness"])) or 0.0,
            approx_distinct=_value(ctx.metric(a["distinct"])) or 0.0,
        )
        if "minimum" in a:
            p.is_numeric = True
            p.minimum = _value(ctx.metric(a["minimum"]))
            p.maximum = _value(ctx.metric(a["maximum"]))
            p.mean = _value(ctx.metric(a["mean"]))
            p.stddev = _value(ctx.metric(a["stddev"]))
        if "min_length" in a:
            p.is_string = True
            p.min_length = _value(ctx.metric(a["min_length"]))
            p.max_length = _value(ctx.metric(a["max_length"]))
        profiles[c] = p
    n_rows = _value(ctx.metric(analyzers[0])) or 0.0

    # string type inference states (cheap second use of pass-1 pattern:
    # fused into ONE extra agg job for all string columns)
    string_cols = [c for c in cols if profiles[c].is_string]
    if string_cols:
        dtype_analyzers = [DataTypeHistogram(c) for c in string_cols]
        slices = []
        exprs = []
        for a in dtype_analyzers:
            ae = a.aggregation_exprs(df)
            slices.append((a, len(exprs), len(exprs) + len(ae)))
            exprs.extend(ae)
        row = list(
            df.agg(*(e.alias(f"_p{i}") for i, e in enumerate(exprs))).first()
        )
        for a, start, end in slices:
            state = a.state_from_agg(row[start:end])
            prof = profiles[a.instance]
            prof.inferred_type = state.inferred_type()
            prof.type_fractions = state.histogram()

    # pass 2: exact histograms for low-cardinality columns
    if with_histograms:
        for c in cols:
            p = profiles[c]
            if 0 < p.approx_distinct <= low_cardinality_threshold:
                rows = Histogram(c, max_detail_bins=low_cardinality_threshold
                                 ).distribution(df).collect()
                p.histogram = [
                    (str(r["value"]), int(r["count"]), float(r["ratio"]))
                    for r in rows
                ]

    # key-likeness: HLL nominates candidates (approx distinct within
    # sketch error of the row count); the exact Uniqueness analyzer
    # confirms, so a near-unique column (dup values below HLL error)
    # never yields a false is_unique suggestion.  Only candidate
    # columns pay the exact groupBy.
    for c, p in profiles.items():
        candidate = (
            n_rows > 0
            and p.completeness == 1.0
            and p.approx_distinct >= 0.9 * n_rows
        )
        if candidate:
            metric = Uniqueness([c]).calculate(df)
            p.uniqueness = _value(metric)
            p.looks_unique = p.uniqueness == 1.0
    return profiles


def numeric_histogram(
    df: DataFrame, column: str, n_bins: int = 20
) -> DataFrame:
    """Equal-width binned histogram of a numeric column:
    ``(bin, lo, hi, count)`` with ``bin`` in [0, n_bins).

    Two cheap phases: a min/max agg (tiny), then one hash-aggregate
    groupBy on the computed bin index — both single-scan, shuffle only
    of n_bins aggregate rows.  The max value lands in the last bin
    (half-open bins except the final one, matching numpy.histogram).
    """
    from pyspark.sql import functions as F

    row = df.agg(
        F.min(F.col(column).cast("double")).alias("lo"),
        F.max(F.col(column).cast("double")).alias("hi"),
    ).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return df.sparkSession.createDataFrame(
            [], "bin int, lo double, hi double, count long"
        )
    if hi == lo:
        hi = lo + 1.0  # single-valued column -> everything in bin 0
    width = (hi - lo) / n_bins
    v = F.col(column).cast("double")
    bin_col = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(n_bins - 1),
    )
    return (
        df.where(v.isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            "count",
        )
        .orderBy("bin")
    )


@dataclass(frozen=True)
class ConstraintSuggestion:
    column: str
    description: str
    code: str  # the fluent-API call this suggestion corresponds to
    add_to_check: "Callable[[Check], Check]" = field(compare=False)


def suggest_constraints(
    profiles: Dict[str, ColumnProfile],
    contained_in_max_values: int = 20,
) -> List[ConstraintSuggestion]:
    """Deequ-style suggestion rules over profiles:

    * complete column        -> ``is_complete``
    * mostly complete        -> ``has_completeness(>= observed-5%)``
    * all-distinct           -> ``is_unique``
    * low cardinality        -> ``is_contained_in(observed values)``
    * non-negative numerics  -> ``is_non_negative``
    * typed string columns   -> ``has_data_type(dominant fraction)``
    """
    out: List[ConstraintSuggestion] = []
    for c, p in profiles.items():
        if p.completeness == 1.0:
            out.append(
                ConstraintSuggestion(
                    c,
                    f"'{c}' has no missing values",
                    f'.is_complete("{c}")',
                    lambda chk, c=c: chk.is_complete(c),
                )
            )
        elif p.completeness > 0:
            bound = max(0.0, round(p.completeness - 0.05, 2))
            out.append(
                ConstraintSuggestion(
                    c,
                    f"'{c}' is {p.completeness:.1%} complete",
                    f'.has_completeness("{c}", lambda v: v >= {bound})',
                    lambda chk, c=c, b=bound: chk.has_completeness(
                        c, lambda v, b=b: v >= b
                    ),
                )
            )
        if p.histogram is not None and len(p.histogram) <= contained_in_max_values:
            values = tuple(v for v, _, _ in p.histogram)
            if not p.is_numeric and values:
                out.append(
                    ConstraintSuggestion(
                        c,
                        f"'{c}' takes {len(values)} distinct values",
                        f'.is_contained_in("{c}", {values!r})',
                        lambda chk, c=c, vals=values: chk.is_contained_in(
                            c, vals
                        ),
                    )
                )
        if p.looks_unique:
            out.append(
                ConstraintSuggestion(
                    c,
                    f"'{c}' looks like a unique key"
                    f" (~{p.approx_distinct:.0f} distinct values)",
                    f'.is_unique("{c}")',
                    lambda chk, c=c: chk.is_unique(c),
                )
            )
        if p.is_numeric and p.minimum is not None and p.minimum >= 0:
            out.append(
                ConstraintSuggestion(
                    c,
                    f"'{c}' is never negative (min {p.minimum:g})",
                    f'.is_non_negative("{c}")',
                    lambda chk, c=c: chk.is_non_negative(c),
                )
            )
        if (
            p.inferred_type is not None
            and p.inferred_type not in ("string", "null")
        ):
            out.append(
                ConstraintSuggestion(
                    c,
                    f"'{c}' values parse as {p.inferred_type}",
                    f'.has_data_type("{c}", lambda v: v == 1.0)',
                    lambda chk, c=c: chk.has_data_type(
                        c, lambda v: v == 1.0
                    ),
                )
            )
    return out


def suggested_check(
    suggestions: Sequence[ConstraintSuggestion],
    level: CheckLevel = CheckLevel.WARNING,
    description: str = "suggested constraints",
) -> Check:
    check = Check(level, description)
    for s in suggestions:
        check = s.add_to_check(check)
    return check
