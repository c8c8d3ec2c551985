"""Column profiling + constraint suggestion (Deequ's
``ColumnProfilerRunner`` / ``ConstraintSuggestionRunner`` surface;
absent from the reference).

Pass structure mirrors Deequ's three-pass design, executed with this
engine's fused runner so each pass is ONE Spark job:

* pass 1 — generic + type-specific statistics for every profiled
  column in a single fused ``df.agg`` scan (completeness, approx
  distinct count, min/max/mean/stddev for numerics, min/max length +
  type inference for strings).
* pass 2 — (only for columns nominated by pass 1) exact value
  histograms for low-cardinality columns AND exact uniqueness
  confirmation for key candidates, fused into ONE exploded
  ``groupBy(column_name, value)`` scan shared by every nominated
  column — never a per-column job.

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
    Completeness,
    DataTypeHistogram,
    Maximum,
    MaxLength,
    Mean,
    Minimum,
    MinLength,
    Size,
    StandardDeviation,
)
from .analyzers.base import (
    Analyzer,
    ScanShareableAnalyzer,
    apply_projections,
    sql_ident as _ident,
    sql_str_lit as _slit,
)
from .checks import Check, CheckLevel
from .metrics import Entity
from .states import NumMatches


class _ProfileDistinct(ScanShareableAnalyzer):
    """Distinct-count estimate for profiling, via the DataSketches HLL
    aggregate (``hll_sketch_agg``, lgConfigK=12, ~1.6% relative error).

    Deliberately NOT the public ``ApproxCountDistinct`` (HLL++): on the
    profiler's fused scan the HLL++ update at rsd=0.05 measured ~0.4s
    over sf0.1 orders vs ~0.3s for the DataSketches sketch — and the
    tighter error keeps unique-key nomination (threshold 0.9·rows) many
    sigma away from a miss, while fewer false nominations keep pass 2's
    hashed-value shuffle small at scale.  Types outside the sketch's
    native set (integral/string/binary) are cast to string, which is
    value-distinct-preserving for profiling purposes."""

    def __init__(self, column: str):
        super().__init__("ProfileDistinct", column, Entity.COLUMN)

    def aggregation_exprs(self, df: DataFrame) -> List:
        from pyspark.sql import functions as F

        c = F.col(self.instance)
        dtype = df.schema[self.instance].dataType
        # hll_sketch_agg accepts ONLY int/bigint/string/binary:
        # byte/short (IntegralType but not accepted) widen to long
        # (value-distinct-preserving), everything else stringifies
        if isinstance(dtype, (T.ByteType, T.ShortType)):
            c = c.cast("long")
        elif not isinstance(
            dtype, (T.IntegerType, T.LongType, T.StringType, T.BinaryType)
        ):
            c = c.cast("string")
        return [F.hll_sketch_estimate(F.hll_sketch_agg(c, F.lit(12)))]

    def state_from_agg(self, values: Sequence) -> Optional[NumMatches]:
        return NumMatches(int(values[0] or 0))


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
            "distinct": _ProfileDistinct(c),
        }
        if isinstance(dtype, (T.NumericType, T.BooleanType)):
            a.update(
                minimum=Minimum(c),
                maximum=Maximum(c),
                mean=Mean(c),
                stddev=StandardDeviation(c),
            )
        elif isinstance(dtype, T.StringType):
            a.update(
                min_length=MinLength(c),
                max_length=MaxLength(c),
                dtype=DataTypeHistogram(c),
            )
        per_col[c] = a
        analyzers.extend(a.values())

    # pass 1: ONE fused df.agg evaluating every analyzer's aggregate
    # expressions — including the DataTypeHistogram bucket counts, which
    # used to run as a second full-scan job because do_analysis_run only
    # surfaces metrics; here we slice the fused row into per-analyzer
    # STATES directly (same mechanism as the lineage runner).
    agg_input = apply_projections(df, analyzers)
    slices: List[tuple] = []
    exprs: List = []
    for a in analyzers:
        ae = a.cached_aggregation_exprs(agg_input)
        slices.append((a, len(exprs), len(exprs) + len(ae)))
        exprs.extend(ae)
    # positional consumption -> no .alias() py4j round trips
    row = list(agg_input.agg(*exprs).first())
    states: Dict[Analyzer, object] = {}
    for a, start, end in slices:
        try:
            states[a] = a.state_from_agg(row[start:end])
        except Exception:  # e.g. stddev over an all-null column
            states[a] = None

    def _state_value(analyzer: Analyzer) -> Optional[float]:
        state = states.get(analyzer)
        if state is None:
            return None
        try:
            return float(state.metric_value())
        except Exception:  # noqa: BLE001
            return None

    profiles: Dict[str, ColumnProfile] = {}
    for c in cols:
        dtype = schema[c].dataType
        a = per_col[c]
        p = ColumnProfile(
            column=c,
            spark_type=dtype.simpleString(),
            completeness=_state_value(a["completeness"]) or 0.0,
            approx_distinct=_state_value(a["distinct"]) or 0.0,
        )
        if "minimum" in a:
            p.is_numeric = True
            p.minimum = _state_value(a["minimum"])
            p.maximum = _state_value(a["maximum"])
            p.mean = _state_value(a["mean"])
            p.stddev = _state_value(a["stddev"])
        if "min_length" in a:
            p.is_string = True
            p.min_length = _state_value(a["min_length"])
            p.max_length = _state_value(a["max_length"])
            dstate = states.get(a["dtype"])
            if dstate is not None:
                p.inferred_type = dstate.inferred_type()
                p.type_fractions = dstate.histogram()
        profiles[c] = p
    n_rows = _state_value(analyzers[0]) or 0.0

    # pass 2 (fused): exact value histograms for low-cardinality columns
    # AND exact uniqueness confirmation for key candidates, in ONE scan.
    #
    # HLL nominates both column sets from pass 1: low-cardinality
    # columns get a histogram; columns whose approx distinct count is
    # within sketch error of the row count are key CANDIDATES whose
    # exact uniqueness must be confirmed (a near-unique column with dup
    # values below HLL error must never yield a false is_unique).
    #
    # Plan: explode each profiled row into (column_name, value-as-string)
    # pairs for just the nominated columns, groupBy(name, value) for the
    # frequency table, then groupBy(name) for per-column sufficient
    # statistics — the design that replaced one full groupBy over the
    # raw table PER COLUMN (a 50-column table paid ~dozens of scans).
    # Scale notes: the (name, value) shuffle is well distributed even
    # for near-unique columns; the per-name aggregate is map-side
    # partial (sums/counts), and the only collect_list is gated to
    # low-cardinality columns, so its per-group payload is bounded by
    # ~low_cardinality_threshold entries.  Values are keyed by their
    # Spark string cast (within one column, distinct values cast to
    # distinct strings for every profiled type).
    from pyspark.sql import functions as F

    hist_cols = [
        c
        for c in cols
        if with_histograms
        and 0 < profiles[c].approx_distinct <= low_cardinality_threshold
    ]
    key_candidates = [
        c
        for c, p in profiles.items()
        if n_rows > 0
        and p.completeness == 1.0
        and p.approx_distinct >= 0.9 * n_rows
    ]
    pass2_cols = list(dict.fromkeys(hist_cols + key_candidates))
    if pass2_cols:
        # Histogram columns need the VALUE strings (they become bins);
        # key candidates only need per-value counts, so their shuffle
        # key is the 64-bit xxhash of the value — 8 bytes per row
        # instead of an arbitrarily fat string (think a near-unique
        # text/url column at 10^12 rows).  A hash collision can only
        # MERGE two distinct values (depressing measured uniqueness),
        # so the `is_unique` suggestion can never be falsely confirmed
        # by it — the safe direction, at ~n^2/2^64 probability.
        def _pval_sql(c: str) -> str:
            if c in hist_cols:
                return f"cast({_ident(c)} as string)"
            return (
                f"case when {_ident(c)} is not null"
                f" then cast(xxhash64({_ident(c)}) as string) end"
            )

        # one `stack` generator built as a single SQL parse (the
        # equivalent explode(array(struct..)) Column chain costs ~40
        # py4j round trips of driver time per profiling call); column
        # names are escaped both as identifiers and as the literal
        # labels (quotes/backslashes/backticks are legal in names)
        stack_args = ", ".join(
            f"'{_slit(c)}', {_pval_sql(c)}" for c in pass2_cols
        )
        pairs = df.selectExpr(
            f"stack({len(pass2_cols)}, {stack_args}) AS (_pcol, _pval)"
        ).where("_pval is not null")
        freq = pairs.groupBy("_pcol", "_pval").agg(
            F.count(F.lit(1)).alias("_pcnt")
        )
        in_hist = (
            F.col("_pcol").isin(hist_cols) if hist_cols else F.lit(False)
        )
        stats = freq.groupBy("_pcol").agg(
            F.sum("_pcnt").alias("_total"),
            F.sum(F.when(F.col("_pcnt") == 1, 1).otherwise(0)).alias(
                "_singletons"
            ),
            F.collect_list(
                F.when(in_hist, F.struct("_pcnt", "_pval"))
            ).alias("_bins"),
        ).collect()
        by_col = {r["_pcol"]: r for r in stats}
        for c in hist_cols:
            r = by_col.get(c)
            if r is None:  # all-null column
                continue
            total = int(r["_total"])
            bins = sorted(
                ((int(b["_pcnt"]), b["_pval"]) for b in r["_bins"]),
                key=lambda t: (-t[0], t[1]),
            )[:low_cardinality_threshold]
            profiles[c].histogram = [
                (v, n, n / total) for n, v in bins
            ]
        for c in key_candidates:
            r = by_col.get(c)
            if r is None:
                continue
            p = profiles[c]
            p.uniqueness = int(r["_singletons"]) / int(r["_total"])
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
