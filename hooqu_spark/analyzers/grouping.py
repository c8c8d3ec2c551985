"""Frequency-based (grouping) analyzers.

``compute_frequencies`` builds the SQL the reference documents
(``hooqu/analyzers/grouping_analyzers.py:48-55``)::

    SELECT cols..., COUNT(*) FROM data
    WHERE col_a IS NOT NULL OR col_b IS NOT NULL ...
    GROUP BY cols...

as a lazy Spark plan — a two-phase hash aggregate (map-side partial
combine, then shuffle on the group keys).  Spark groups NULL keys
natively, replacing the reference's ``fillna(-1)`` sentinel hack
(``grouping_analyzers.py:66-75``) without the -1 collision bug.

All concrete metrics (Uniqueness, Distinctness, UniqueValueRatio,
Entropy, CountDistinct) reduce the frequency table with ONE shared
aggregation producing the sufficient statistics
``(total, groups, singletons, sum(c*ln c))`` — so a single groupBy job
serves every grouping analyzer on the same (columns, where) pair.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..expr import translate
from ..metrics import DoubleMetric
from ..states import State
from .base import (
    COUNT_COL,
    Analyzer,
    at_least_one,
    entity_from,
    has_column,
    metric_from_empty,
    metric_from_value,
)


class FrequenciesAndNumRows(State):
    """Group-frequencies state backed by a lazy Spark DataFrame
    ``(group_cols..., hooqu_count)`` with the row count derived on
    demand (num_rows == sum of group counts, so no second scan).

    The reference left this state's merge ``NotImplementedError``
    (``grouping_analyzers.py:21-27``); on Spark the monoid is natural:
    union the frequency tables and re-aggregate.
    """

    def __init__(self, frequencies: DataFrame, num_rows: Optional[int] = None):
        self.frequencies = frequencies
        self._num_rows = num_rows

    @property
    def num_rows(self) -> int:
        if self._num_rows is None:
            row = self.frequencies.agg(
                F.coalesce(F.sum(COUNT_COL), F.lit(0))
            ).first()
            self._num_rows = int(row[0])
        return self._num_rows

    def sum(self, other: "FrequenciesAndNumRows") -> "FrequenciesAndNumRows":
        group_cols = [c for c in self.frequencies.columns if c != COUNT_COL]
        merged = (
            self.frequencies.unionByName(other.frequencies)
            .groupBy(*group_cols)
            .agg(F.sum(COUNT_COL).alias(COUNT_COL))
        )
        return FrequenciesAndNumRows(merged)


class FrequencyBasedAnalyzer(Analyzer):
    """Base for analyzers over group frequencies."""

    def __init__(self, name: str, cols_to_group_on: Sequence[str],
                 where: Optional[str] = None):
        self._cols_to_group_on = list(cols_to_group_on)
        super().__init__(
            name,
            ",".join(self._cols_to_group_on),
            entity_from(self._cols_to_group_on),
            where,
        )

    @property
    def grouping_columns(self) -> Sequence[str]:
        return self._cols_to_group_on

    def _identity(self):
        return super()._identity() + (tuple(self._cols_to_group_on),)

    def preconditions(self):
        return [at_least_one(self.grouping_columns)] + [
            has_column(c) for c in self.grouping_columns
        ]

    @staticmethod
    def compute_frequencies(
        data: DataFrame,
        grouping_columns: Sequence[str],
        where: Optional[str] = None,
    ) -> FrequenciesAndNumRows:
        cols = list(grouping_columns)
        if where is not None:
            data = data.where(F.expr(translate(where)))
        any_not_null = reduce(
            lambda a, b: a | b, (F.col(c).isNotNull() for c in cols)
        )
        frequencies = (
            data.select(*cols)
            .where(any_not_null)
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias(COUNT_COL))
        )
        return FrequenciesAndNumRows(frequencies)

    def compute_state_from(self, data: DataFrame) -> FrequenciesAndNumRows:
        return FrequencyBasedAnalyzer.compute_frequencies(
            data, self.grouping_columns, self.where
        )

    # -- shared sufficient statistics over the frequency table --------------
    @staticmethod
    def frequency_stats(frequencies: DataFrame) -> Tuple[int, int, int, float]:
        """(total_rows, n_groups, n_singleton_groups, sum(c*ln c)) in one job."""
        cnt = F.col(COUNT_COL)
        row = frequencies.agg(
            F.coalesce(F.sum(cnt), F.lit(0)).alias("total"),
            F.count(F.lit(1)).alias("groups"),
            F.coalesce(
                F.sum(F.when(cnt == 1, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).alias("singletons"),
            F.coalesce(
                F.sum(cnt.cast("double") * F.log(cnt.cast("double"))), F.lit(0.0)
            ).alias("clnc"),
        ).first()
        return int(row[0]), int(row[1]), int(row[2]), float(row[3])

    def metric_from_stats(
        self, total: int, groups: int, singletons: int, clnc: float
    ) -> DoubleMetric:
        if total == 0:
            return metric_from_empty(self, self.name, self.instance, self.entity)
        return metric_from_value(
            self._value_from_stats(total, groups, singletons, clnc),
            self.name,
            self.instance,
            self.entity,
        )

    def _value_from_stats(
        self, total: int, groups: int, singletons: int, clnc: float
    ) -> float:
        raise NotImplementedError

    def compute_metric_from(
        self, state: Optional[FrequenciesAndNumRows]
    ) -> DoubleMetric:
        if state is None:
            return metric_from_empty(self, self.name, self.instance, self.entity)
        total, groups, singletons, clnc = self.frequency_stats(state.frequencies)
        return self.metric_from_stats(total, groups, singletons, clnc)


class Uniqueness(FrequencyBasedAnalyzer):
    """Fraction of value combinations occurring exactly once.
    Reference: ``hooqu/analyzers/uniqueness.py:17-32``."""

    def __init__(self, columns: Sequence[str], where: Optional[str] = None):
        if isinstance(columns, str):
            columns = [columns]
        super().__init__("Uniqueness", columns, where)

    def _value_from_stats(self, total, groups, singletons, clnc) -> float:
        return singletons / total


class Distinctness(FrequencyBasedAnalyzer):
    """Distinct combinations / rows (Deequ-style extension)."""

    def __init__(self, columns: Sequence[str], where: Optional[str] = None):
        if isinstance(columns, str):
            columns = [columns]
        super().__init__("Distinctness", columns, where)

    def _value_from_stats(self, total, groups, singletons, clnc) -> float:
        return groups / total


class UniqueValueRatio(FrequencyBasedAnalyzer):
    """Singleton groups / distinct groups (Deequ-style extension)."""

    def __init__(self, columns: Sequence[str], where: Optional[str] = None):
        if isinstance(columns, str):
            columns = [columns]
        super().__init__("UniqueValueRatio", columns, where)

    def _value_from_stats(self, total, groups, singletons, clnc) -> float:
        return singletons / groups


class CountDistinct(FrequencyBasedAnalyzer):
    """Exact distinct count of combinations (Deequ-style extension)."""

    def __init__(self, columns: Sequence[str], where: Optional[str] = None):
        if isinstance(columns, str):
            columns = [columns]
        super().__init__("CountDistinct", columns, where)

    def _value_from_stats(self, total, groups, singletons, clnc) -> float:
        return float(groups)


class Entropy(FrequencyBasedAnalyzer):
    """Shannon entropy of the group distribution (nats), computed from
    the identity  -sum(p ln p) = ln(T) - sum(c ln c)/T  so it shares
    the single frequency aggregation (Deequ-style extension)."""

    def __init__(self, columns: Sequence[str], where: Optional[str] = None):
        if isinstance(columns, str):
            columns = [columns]
        super().__init__("Entropy", columns, where)

    def _value_from_stats(self, total, groups, singletons, clnc) -> float:
        return math.log(total) - clnc / total


GROUPING_ANALYZERS = (
    Uniqueness,
    Distinctness,
    UniqueValueRatio,
    CountDistinct,
    Entropy,
)
