"""Port of hooqu/tests/test_grouping_analyzers.py + extension analyzers."""

import math

from hooqu_spark.analyzers import (
    COUNT_COL,
    CountDistinct,
    Distinctness,
    Entropy,
    FrequencyBasedAnalyzer,
    UniqueValueRatio,
)


class TestBaseGroupingAnalyzer:
    def test_frequency_based_analyzers_computes_correct_frequencies(self, spark):
        df = spark.createDataFrame([("A",), ("B",), ("B",)], "att1 string")
        state = FrequencyBasedAnalyzer.compute_frequencies(df, ["att1"])
        assert state.num_rows == 3
        freqs = {
            r["att1"]: r[COUNT_COL] for r in state.frequencies.collect()
        }
        assert freqs == {"A": 1, "B": 2}

    def test_frequencies_merge_monoid(self, spark):
        df1 = spark.createDataFrame([("A",), ("B",)], "att1 string")
        df2 = spark.createDataFrame([("B",), ("C",)], "att1 string")
        s1 = FrequencyBasedAnalyzer.compute_frequencies(df1, ["att1"])
        s2 = FrequencyBasedAnalyzer.compute_frequencies(df2, ["att1"])
        merged = s1.sum(s2)
        freqs = {r["att1"]: r[COUNT_COL] for r in merged.frequencies.collect()}
        assert freqs == {"A": 1, "B": 2, "C": 1}
        assert merged.num_rows == 4

    def test_null_keys_grouped_when_other_column_non_null(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", None), (None, None)], "x string, y string"
        )
        state = FrequencyBasedAnalyzer.compute_frequencies(df, ["x", "y"])
        # row with all-null grouping cols is excluded; null y participates
        assert state.num_rows == 2
        rows = state.frequencies.collect()
        assert len(rows) == 1 and rows[0][COUNT_COL] == 2


class TestExtensionGroupingAnalyzers:
    def test_distinctness(self, spark):
        df = spark.createDataFrame([("A",), ("B",), ("B",)], "att1 string")
        assert Distinctness(["att1"]).calculate(df).value.get() == 2 / 3

    def test_unique_value_ratio(self, spark):
        df = spark.createDataFrame(
            [("A",), ("B",), ("B",), ("C",)], "att1 string"
        )
        assert UniqueValueRatio(["att1"]).calculate(df).value.get() == 2 / 3

    def test_count_distinct(self, spark):
        df = spark.createDataFrame([("A",), ("B",), ("B",)], "att1 string")
        assert CountDistinct(["att1"]).calculate(df).value.get() == 2.0

    def test_entropy(self, spark):
        df = spark.createDataFrame(
            [("A",), ("A",), ("B",), ("B",)], "att1 string"
        )
        value = Entropy(["att1"]).calculate(df).value.get()
        assert math.isclose(value, math.log(2))
