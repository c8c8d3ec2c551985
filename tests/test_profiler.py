"""Column profiling + constraint suggestion."""

import pytest

from hooqu_spark import (
    CheckLevel,
    CheckStatus,
    VerificationSuite,
    profile_columns,
    suggest_constraints,
    suggested_check,
)


@pytest.fixture(scope="module")
def df_profiling(spark):
    rows = [
        (i, f"user{i}", ["red", "green", "blue"][i % 3],
         float(i) if i % 10 else None, str(i))
        for i in range(100)
    ]
    return spark.createDataFrame(
        rows, "id long, name string, color string, score double, code string"
    )


class TestProfileColumns:
    def test_profiles_all_columns(self, df_profiling):
        profiles = profile_columns(df_profiling)
        assert set(profiles) == {"id", "name", "color", "score", "code"}

    def test_numeric_profile(self, df_profiling):
        p = profile_columns(df_profiling, ["id"])["id"]
        assert p.is_numeric
        assert p.minimum == 0.0 and p.maximum == 99.0
        assert p.mean == pytest.approx(49.5)
        assert p.completeness == 1.0
        assert p.looks_unique

    def test_nullable_numeric(self, df_profiling):
        p = profile_columns(df_profiling, ["score"])["score"]
        assert p.completeness == pytest.approx(0.9)
        assert not p.looks_unique

    def test_low_cardinality_histogram(self, df_profiling):
        p = profile_columns(df_profiling, ["color"])["color"]
        assert p.is_string
        assert p.histogram is not None
        values = {v for v, _, _ in p.histogram}
        assert values == {"red", "green", "blue"}
        assert sum(n for _, n, _ in p.histogram) == 100

    def test_string_type_inference(self, df_profiling):
        profiles = profile_columns(df_profiling, ["code", "name"])
        assert profiles["code"].inferred_type == "integral"
        assert profiles["name"].inferred_type == "string"

    def test_high_cardinality_skips_histogram(self, df_profiling):
        p = profile_columns(
            df_profiling, ["name"], low_cardinality_threshold=10
        )["name"]
        assert p.histogram is None

    def test_narrow_integral_types_profile(self, spark):
        # hll_sketch_agg only accepts int/bigint/string/binary —
        # tinyint/smallint columns must widen, not crash the fused scan
        df = spark.createDataFrame(
            [(i % 3, i % 5, i) for i in range(40)],
            "b tinyint, s smallint, i int",
        )
        profiles = profile_columns(df)
        assert profiles["b"].approx_distinct == 3
        assert profiles["s"].approx_distinct == 5

    def test_quoted_column_names_profile(self, spark):
        # pass-2 builds SQL via stack(); names containing single
        # quotes must be escaped both as identifiers and as the label
        # literals.  (Backtick-containing names are rejected by
        # F.col() itself across the analyzer layer — out of scope.)
        df = spark.createDataFrame(
            [("x", 1), ("y", 2), ("x", 3)],
            ["it's a col", "n"],
        )
        profiles = profile_columns(df)
        assert profiles["it's a col"].approx_distinct == 2
        assert profiles["it's a col"].completeness == 1.0


class TestNumericHistogram:
    def test_matches_numpy(self, spark):
        import numpy as np

        from hooqu_spark import numeric_histogram

        rng = np.random.RandomState(5)
        vals = rng.uniform(-3.0, 7.0, 500)
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        rows = numeric_histogram(df, "v", n_bins=10).collect()
        want, edges = np.histogram(vals, bins=10, range=(vals.min(), vals.max()))
        got = {r["bin"]: r["count"] for r in rows}
        for i, w in enumerate(want):
            assert got.get(i, 0) == w, (i, got.get(i, 0), w)
        assert rows[0]["lo"] == pytest.approx(float(edges[0]))
        assert rows[-1]["hi"] == pytest.approx(float(edges[-1]))

    def test_constant_column(self, spark):
        from hooqu_spark import numeric_histogram

        df = spark.createDataFrame([(5.0,)] * 7, "v double")
        rows = numeric_histogram(df, "v", n_bins=4).collect()
        assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["count"] == 7

    def test_all_null(self, spark):
        from hooqu_spark import numeric_histogram

        df = spark.createDataFrame([(None,), (None,)], "v double")
        assert numeric_histogram(df, "v").count() == 0


class TestSuggestions:
    def test_suggestions_cover_expected_rules(self, df_profiling):
        profiles = profile_columns(df_profiling)
        suggestions = suggest_constraints(profiles)
        codes = {s.code for s in suggestions}
        assert '.is_complete("id")' in codes
        assert '.is_unique("id")' in codes
        assert '.is_non_negative("id")' in codes
        assert any(c.startswith('.is_contained_in("color"') for c in codes)
        assert '.has_data_type("code", lambda v: v == 1.0)' in codes
        assert any(
            c.startswith('.has_completeness("score"') for c in codes
        )

    def test_suggested_check_passes_on_profiled_data(
        self, spark, df_profiling
    ):
        profiles = profile_columns(df_profiling)
        check = suggested_check(
            suggest_constraints(profiles), level=CheckLevel.ERROR
        )
        result = (
            VerificationSuite().on_data(df_profiling).add_check(check).run()
        )
        failing = [
            r.message
            for cr in result.check_results.values()
            for r in cr.constraint_results
            if r.status.name != "SUCCESS"
        ]
        assert result.status == CheckStatus.SUCCESS, failing
