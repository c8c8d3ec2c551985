"""Fluent Check API (user surface).

Driver-side port of the reference's ``hooqu/checks.py`` builder: each
method appends a constraint; ``.where(query)`` swaps the last-added
constraint for a filtered version
(``checks.py:713-752``).  Predicates are authored in the same
pandas-eval dialect the reference uses and translated to Spark SQL at
execution time (``hooqu_spark/expr.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum, IntEnum
from typing import (
    Any,
    Callable,
    List,
    Optional,
    Pattern,
    Sequence,
    Set,
    Tuple,
    Union,
    cast,
)

import numpy as np

from . import patterns
from .analyzers import Analyzer
from .analyzers.runner import AnalyzerContext
from .constraints import (
    AnalysisBasedConstraint,
    Constraint,
    ConstraintDecorator,
    ConstraintResult,
    ConstraintStatus,
    approx_count_distinct_constraint,
    completeness_constraint,
    count_distinct_constraint,
    compliance_constraint,
    correlation_constraint,
    data_type_constraint,
    distinctness_constraint,
    entropy_constraint,
    max_constraint,
    max_length_constraint,
    mean_constraint,
    min_constraint,
    min_length_constraint,
    mutual_information_constraint,
    pattern_match_constraint,
    quantile_constraint,
    size_constraint,
    standard_deviation_constraint,
    sum_constraint,
    uniqueness_constraint,
    unique_value_ratio_constraint,
)


class CheckLevel(Enum):
    WARNING = 0
    ERROR = 1


class CheckStatus(IntEnum):
    SUCCESS = 0
    WARNING = 1
    ERROR = 2


@dataclass(frozen=True, eq=True)
class CheckResult:
    check: Any
    status: CheckStatus
    constraint_results: Sequence[ConstraintResult] = field(default_factory=tuple)


def is_one(value: Union[float, int]) -> bool:
    return value == 1


@dataclass(frozen=True, eq=True)
class Check:
    level: CheckLevel
    description: str
    constraints: Tuple[Constraint, ...] = field(default_factory=tuple)

    def add_constraint(self, constraint: Constraint) -> "Check":
        return Check(self.level, self.description, self.constraints + (constraint,))

    def _add_filterable_constraint(
        self, creation_func: Callable[[Optional[str]], Constraint]
    ) -> "CheckWithLastConstraintFilterable":
        constraint_without_filtering = creation_func(None)
        return CheckWithLastConstraintFilterable(
            self.level,
            self.description,
            self.constraints + (constraint_without_filtering,),
            creation_func,
        )

    def required_analyzers(self) -> Set[Analyzer]:
        rc = (
            c.inner if isinstance(c, ConstraintDecorator) else c
            for c in self.constraints
        )
        anbc = cast(
            List[AnalysisBasedConstraint],
            [c for c in rc if isinstance(c, AnalysisBasedConstraint)],
        )
        return {c.analyzer for c in anbc}

    # -- metric constraints --------------------------------------------------
    def has_size(
        self, assertion: Callable[[int], bool], hint: Optional[str] = None
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: size_constraint(assertion, filter_, hint)
        )

    def has_min(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: min_constraint(column, assertion, filter_, hint)
        )

    def has_max(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: max_constraint(column, assertion, filter_, hint)
        )

    def is_complete(
        self, column: str, hint: Optional[str] = None
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: completeness_constraint(column, is_one, filter_, hint)
        )

    def has_completeness(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: completeness_constraint(column, assertion, filter_, hint)
        )

    def has_mean(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: mean_constraint(column, assertion, filter_, hint)
        )

    def has_standard_deviation(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: standard_deviation_constraint(
                column, assertion, filter_, hint
            )
        )

    def has_sum(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: sum_constraint(column, assertion, filter_, hint)
        )

    def has_quantile(
        self,
        column: str,
        quantile: float,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: quantile_constraint(
                column, quantile, assertion, filter_, hint
            )
        )

    # -- compliance family ----------------------------------------------------
    def satisfies(
        self,
        column_condition: str,
        constraint_name: str,
        assertion: Callable[[float], bool] = is_one,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: compliance_constraint(
                constraint_name, column_condition, assertion, filter_, hint
            )
        )

    def is_non_negative(
        self,
        column: str,
        assertion: Callable[[float], bool] = is_one,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        # coalescing column to not count NULL values as non-compliant
        return self.satisfies(
            f"`{column}`.fillna(0) >= 0",
            f"{column} is non-negative",
            assertion,
            hint=hint,
        )

    def is_positive(
        self,
        column: str,
        assertion: Callable[[float], bool] = is_one,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self.satisfies(
            f"`{column}`.fillna(1.0) > 0",
            f"{column} is positive",
            assertion,
            hint=hint,
        )

    def is_contained_in(
        self,
        column: str,
        allowed_values: Sequence[Union[str, int]],
        assertion: Callable[[float], bool] = is_one,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        allowed_values = list(allowed_values)
        is_numeric_sequence = all(
            isinstance(value, (int, np.integer)) for value in allowed_values
        )
        if not allowed_values:
            raise ValueError("Empty list of allowed values used")
        if not isinstance(allowed_values[0], str) and not is_numeric_sequence:
            raise ValueError(
                "The type of allowed values should be string or integer but got"
                f" '{type(allowed_values[0])}'"
            )
        predicate = f"`{column}`.isna() or `{column}`.isin({allowed_values})"
        return self.satisfies(
            predicate, f"{column} contained in {allowed_values}", assertion, hint
        )

    def is_contained_in_range(
        self,
        column: str,
        lower_bound: float,
        upper_bound: float,
        include_lower_bound: bool = True,
        include_upper_bound: bool = True,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        left_operand = ">=" if include_lower_bound else ">"
        right_operand = "<=" if include_upper_bound else "<"
        predicate = (
            f"`{column}`.isna() or "
            f"(`{column}` {left_operand} {lower_bound} "
            f" and `{column}` {right_operand} {upper_bound})"
        )
        return self.satisfies(
            predicate, f"{column} between {lower_bound} and {upper_bound}", hint=hint
        )

    # -- uniqueness family ------------------------------------------------------
    def is_unique(
        self, column: str, hint: Optional[str] = None
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: uniqueness_constraint([column], is_one, filter_, hint)
        )

    def has_uniqueness(
        self,
        columns: Union[Sequence[str], str],
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        if isinstance(columns, str):
            columns = [columns]
        return self._add_filterable_constraint(
            lambda filter_: uniqueness_constraint(columns, assertion, filter_, hint)
        )

    # -- pattern family ----------------------------------------------------------
    def has_pattern(
        self,
        column: str,
        pattern: Union[str, Pattern],
        assertion: Callable[[float], bool] = is_one,
        name: Optional[str] = None,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: pattern_match_constraint(
                column, pattern, assertion, filter_, name=name, hint=hint
            )
        )

    def contains_credit_card_number(
        self,
        column: str,
        assertion: Callable[[float], bool] = is_one,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self.has_pattern(
            column,
            patterns.CREDITCARD,
            assertion=assertion,
            name=f"containsCreditCardNumber({column})",
            hint=hint,
        )

    def contains_email(
        self,
        column: str,
        assertion: Callable[[float], bool] = is_one,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self.has_pattern(
            column,
            patterns.EMAIL,
            assertion=assertion,
            name=f"containsEmail({column})",
            hint=hint,
        )

    def contains_url(
        self,
        column: str,
        assertion: Callable[[float], bool] = is_one,
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self.has_pattern(
            column,
            patterns.URL,
            assertion=assertion,
            name=f"containsURL({column})",
            hint=hint,
        )

    # -- Deequ-style extensions (no reference equivalent) ----------------------
    def are_complete(
        self, columns: Sequence[str], hint: Optional[str] = None
    ) -> "CheckWithLastConstraintFilterable":
        """Every listed column is non-null in every row (one compliance
        predicate, one conditional aggregate in the fused scan)."""
        predicate = " and ".join(f"`{c}`.notna()" for c in columns)
        name = f"areComplete({','.join(columns)})"
        return self.satisfies(predicate, name, is_one, hint=hint)

    def have_completeness(
        self,
        columns: Sequence[str],
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        """Fraction of rows where every listed column is non-null."""
        predicate = " and ".join(f"`{c}`.notna()" for c in columns)
        name = f"haveCompleteness({','.join(columns)})"
        return self.satisfies(predicate, name, assertion, hint=hint)

    def has_number_of_distinct_values(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: count_distinct_constraint(
                [column], assertion, filter_, hint
            )
        )

    def is_primary_key(
        self, column: str, *other_columns: str, hint: Optional[str] = None
    ) -> "CheckWithLastConstraintFilterable":
        """Columns jointly unique AND each individually complete."""
        cols = [column, *other_columns]
        check = self
        for c in cols:
            check = check.is_complete(c, hint=hint)
        return check.has_uniqueness(cols, is_one, hint=hint)

    def has_distinctness(
        self,
        columns: Union[Sequence[str], str],
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        if isinstance(columns, str):
            columns = [columns]
        return self._add_filterable_constraint(
            lambda filter_: distinctness_constraint(
                columns, assertion, filter_, hint
            )
        )

    def has_unique_value_ratio(
        self,
        columns: Union[Sequence[str], str],
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        if isinstance(columns, str):
            columns = [columns]
        return self._add_filterable_constraint(
            lambda filter_: unique_value_ratio_constraint(
                columns, assertion, filter_, hint
            )
        )

    def has_entropy(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: entropy_constraint([column], assertion, filter_, hint)
        )

    def has_mutual_information(
        self,
        column_a: str,
        column_b: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: mutual_information_constraint(
                [column_a, column_b], assertion, filter_, hint
            )
        )

    def has_correlation(
        self,
        column_a: str,
        column_b: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: correlation_constraint(
                column_a, column_b, assertion, filter_, hint
            )
        )

    def has_approx_count_distinct(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: approx_count_distinct_constraint(
                column, assertion, filter_, hint
            )
        )

    def has_min_length(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: min_length_constraint(column, assertion, filter_, hint)
        )

    def has_max_length(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        return self._add_filterable_constraint(
            lambda filter_: max_length_constraint(column, assertion, filter_, hint)
        )

    def has_data_type(
        self,
        column: str,
        assertion: Callable[[float], bool],
        hint: Optional[str] = None,
    ) -> "CheckWithLastConstraintFilterable":
        """Assert on the fraction of non-null values in the dominant
        inferred type bucket (boolean/integral/fractional/string)."""
        return self._add_filterable_constraint(
            lambda filter_: data_type_constraint(column, assertion, filter_, hint)
        )

    # -- evaluation ------------------------------------------------------------
    def evaluate(self, context: AnalyzerContext) -> CheckResult:
        constraint_results = [
            c.evaluate(context.metric_map) for c in self.constraints
        ]
        any_failures = any(
            c.status == ConstraintStatus.FAILURE for c in constraint_results
        )
        check_status = CheckStatus.SUCCESS
        if any_failures and self.level == CheckLevel.ERROR:
            check_status = CheckStatus.ERROR
        elif any_failures and self.level == CheckLevel.WARNING:
            check_status = CheckStatus.WARNING
        return CheckResult(self, check_status, constraint_results)


class CheckWithLastConstraintFilterable(Check):
    def __init__(
        self,
        level: CheckLevel,
        description: str,
        constraints: Tuple[Constraint, ...],
        create_replacement: Callable[[Optional[str]], Constraint],
    ):
        super().__init__(level, description, constraints)
        object.__setattr__(self, "create_replacement", create_replacement)

    def where(self, query: Optional[str]) -> Check:
        """Replace the last-added constraint with a filtered version
        (the filter is a pandas-query-dialect string)."""
        adjusted = self.constraints[:-1] + (self.create_replacement(query),)
        return Check(self.level, self.description, adjusted)

    @classmethod
    def apply(
        cls,
        level: CheckLevel,
        description: str,
        constraints: Tuple[Constraint, ...],
        create_replacement: Callable[[Optional[str]], Constraint],
    ) -> "CheckWithLastConstraintFilterable":
        return CheckWithLastConstraintFilterable(
            level, description, constraints, create_replacement
        )
