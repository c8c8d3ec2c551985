"""Tests for the Deequ-style extension analyzers added beyond the
reference surface: Correlation, DataTypeHistogram, Histogram,
MutualInformation — plus their fluent Check methods, runner fusion,
and the IVF similarity variant."""

import math

import numpy as np
import pytest

from hooqu_spark import Check, CheckLevel, CheckStatus, VerificationSuite
from hooqu_spark.analyzers import (
    Correlation,
    DataTypeHistogram,
    Entropy,
    Histogram,
    MutualInformation,
    do_analysis_run,
)
from hooqu_spark.states import CorrelationState, DataTypeHistogramState


class TestCorrelation:
    @pytest.fixture(scope="class")
    def df_xy(self, spark):
        rows = [
            (1.0, 2.0),
            (2.0, 4.0),
            (3.0, 5.0),
            (4.0, 4.0),
            (5.0, 5.0),
        ]
        return spark.createDataFrame(rows, "x double, y double")

    def test_matches_numpy(self, df_xy):
        value = Correlation("x", "y").calculate(df_xy).value.get()
        xs = [1.0, 2.0, 3.0, 4.0, 5.0]
        ys = [2.0, 4.0, 5.0, 4.0, 5.0]
        expected = np.corrcoef(xs, ys)[0, 1]
        assert value == pytest.approx(expected, rel=1e-12)

    def test_perfect_correlation(self, spark):
        df = spark.createDataFrame(
            [(float(i), 2.0 * i + 1) for i in range(10)], "x double, y double"
        )
        assert Correlation("x", "y").calculate(df).value.get() == pytest.approx(
            1.0
        )

    def test_rows_with_null_or_nan_in_either_column_excluded(self, spark):
        nan = float("nan")
        df = spark.createDataFrame(
            [
                (1.0, 2.0),
                (2.0, None),
                (None, 3.0),
                (nan, 4.0),
                (3.0, 1.0),
            ],
            "x double, y double",
        )
        # only (1,2) and (3,1) participate -> r = -1
        value = Correlation("x", "y").calculate(df).value.get()
        assert value == pytest.approx(-1.0)

    def test_where_filter(self, df_xy):
        value = (
            Correlation("x", "y", where="x <= 3").calculate(df_xy).value.get()
        )
        expected = np.corrcoef([1.0, 2.0, 3.0], [2.0, 4.0, 5.0])[0, 1]
        assert value == pytest.approx(expected, rel=1e-12)

    def test_constant_column_is_nan(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0)], "x double, y double"
        )
        assert math.isnan(Correlation("x", "y").calculate(df).value.get())

    def test_empty_is_failure(self, spark):
        df = spark.createDataFrame([], "x double, y double")
        assert Correlation("x", "y").calculate(df).value.isFailure

    def test_non_numeric_fails_precondition(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "x string, y double")
        assert Correlation("x", "y").calculate(df).value.isFailure

    def test_state_merge_monoid(self, spark, df_xy):
        half1 = df_xy.where("x <= 2")
        half2 = df_xy.where("x > 2")
        a = Correlation("x", "y")
        merged = a.compute_state_from(half1).sum(a.compute_state_from(half2))
        whole = a.compute_state_from(df_xy)
        assert merged.metric_value() == pytest.approx(
            whole.metric_value(), rel=1e-12
        )
        assert isinstance(merged, CorrelationState)


class TestDataTypeHistogram:
    @pytest.fixture(scope="class")
    def df_typed(self, spark):
        rows = [
            ("true",),
            ("false",),
            ("12",),
            ("-7",),
            ("3.14",),
            ("1e3",),  # no decimal point -> string by our classifier
            ("2.5e-2",),
            ("hello",),
            (None,),
        ]
        return spark.createDataFrame(rows, "v string")

    def test_histogram_buckets(self, df_typed):
        state = DataTypeHistogram("v").compute_state_from(df_typed)
        assert state == DataTypeHistogramState(
            n_boolean=2, n_integral=2, n_fractional=2, n_string=2, n_null=1
        )

    def test_metric_is_dominant_fraction(self, spark):
        df = spark.createDataFrame(
            [("1",), ("2",), ("3",), ("x",)], "v string"
        )
        assert DataTypeHistogram("v").calculate(df).value.get() == 0.75

    def test_classifier_matches_regex_semantics(self, spark):
        # the fast (mostly regex-free) classifier must stay exactly
        # equivalent to the documented anchored regexes on edge cases
        import re

        cases = [
            "true", "false", "True", "TRUE", "truex",
            "0", "007", "+1", "-1", "+", "-", "", " 1", "1 ", "+-3",
            "1.5", ".5", "5.", "+.5", "-5.", "1.5e3", "1.5E-3", "1.5e",
            "1e3", "1.2.3", "..", ".", "abc", "1a", "½", "٣", None,
            "true\n", "123\n", "1.5\n", "\n",  # strict \z: all string
        ]
        # \Z (strict end of input) — the documented anchoring; a bare $
        # would also match before one trailing newline in both Python
        # and Java, which the classifier deliberately rejects
        bool_re = re.compile(r"^(true|false)\Z")
        int_re = re.compile(r"^[-+]?[0-9]+\Z")
        frac_re = re.compile(
            r"^[-+]?([0-9]*\.[0-9]+|[0-9]+\.[0-9]*)([eE][-+]?[0-9]+)?\Z"
        )

        def want_bucket(v):
            if v is None:
                return 4
            if bool_re.match(v):
                return 0
            if int_re.match(v):
                return 1
            if frac_re.match(v):
                return 2
            return 3

        df = spark.createDataFrame([(v,) for v in cases], "v string")
        got = [
            r["b"]
            for r in df.select(
                DataTypeHistogram("v")._classifier().alias("b")
            ).collect()
        ]
        assert got == [want_bucket(v) for v in cases]

    def test_trailing_newline_is_string(self, spark):
        # pinned contract: strict \z anchoring means a value carrying a
        # trailing line terminator is a STRING, consistently across all
        # buckets and matching DuckDB's RE2 `$` (end-of-text) oracle
        df = spark.createDataFrame(
            [("true\n",), ("123\n",), ("1.5\n",)], "v string"
        )
        s = DataTypeHistogram("v").compute_state_from(df)
        assert (s.n_boolean, s.n_integral, s.n_fractional, s.n_string) == (
            0, 0, 0, 3,
        )

    def test_inferred_type(self, spark):
        ints = spark.createDataFrame([("1",), ("2",)], "v string")
        assert (
            DataTypeHistogram("v").compute_state_from(ints).inferred_type()
            == "integral"
        )
        mixed_num = spark.createDataFrame([("1",), ("2.5",)], "v string")
        assert (
            DataTypeHistogram("v").compute_state_from(mixed_num).inferred_type()
            == "fractional"
        )
        with_text = spark.createDataFrame([("1",), ("abc",)], "v string")
        assert (
            DataTypeHistogram("v").compute_state_from(with_text).inferred_type()
            == "string"
        )

    def test_merge_monoid(self):
        a = DataTypeHistogramState(1, 2, 0, 1, 0)
        b = DataTypeHistogramState(0, 1, 3, 0, 2)
        assert a.sum(b) == DataTypeHistogramState(1, 3, 3, 1, 2)

    def test_non_string_fails_precondition(self, spark):
        df = spark.createDataFrame([(1,)], "v long")
        assert DataTypeHistogram("v").calculate(df).value.isFailure


class TestHistogram:
    def test_mode_share(self, spark):
        df = spark.createDataFrame(
            [("A",), ("B",), ("B",), ("B",), ("C",)], "att1 string"
        )
        assert Histogram("att1").calculate(df).value.get() == 0.6

    def test_distribution(self, spark):
        df = spark.createDataFrame(
            [("A",), ("B",), ("B",), ("B",), ("C",)], "att1 string"
        )
        rows = Histogram("att1").distribution(df).collect()
        assert [(r["value"], r["count"]) for r in rows] == [
            ("B", 3),
            ("A", 1),
            ("C", 1),
        ]
        assert rows[0]["ratio"] == pytest.approx(0.6)

    def test_max_detail_bins_caps_output(self, spark):
        df = spark.createDataFrame([(str(i % 7),) for i in range(50)], "v string")
        rows = Histogram("v", max_detail_bins=3).distribution(df).collect()
        assert len(rows) == 3

    def test_empty_is_failure(self, spark):
        df = spark.createDataFrame([], "att1 string")
        assert Histogram("att1").calculate(df).value.isFailure


class TestMutualInformation:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [("a", "x"), ("a", "x"), ("b", "y"), ("b", "x")],
            "u string, v string",
        )
        value = MutualInformation(["u", "v"]).calculate(df).value.get()
        expected = (
            0.5 * math.log(0.5 / (0.5 * 0.75))
            + 0.25 * math.log(0.25 / (0.5 * 0.25))
            + 0.25 * math.log(0.25 / (0.5 * 0.75))
        )
        assert value == pytest.approx(expected, rel=1e-12)

    def test_independent_columns_zero(self, spark):
        rows = [(u, v) for u in "ab" for v in "xy"]
        df = spark.createDataFrame(rows, "u string, v string")
        value = MutualInformation(["u", "v"]).calculate(df).value.get()
        assert value == pytest.approx(0.0, abs=1e-12)

    def test_identical_columns_equal_entropy(self, spark):
        df = spark.createDataFrame(
            [("A", "A"), ("B", "B"), ("B", "B")], "u string, v string"
        )
        mi = MutualInformation(["u", "v"]).calculate(df).value.get()
        h = Entropy(["u"]).calculate(df).value.get()
        assert mi == pytest.approx(h, rel=1e-12)

    def test_requires_exactly_two_columns(self):
        with pytest.raises(ValueError):
            MutualInformation(["a"])
        with pytest.raises(ValueError):
            MutualInformation(["a", "b", "c"])

    def test_empty_is_failure(self, spark):
        df = spark.createDataFrame([], "u string, v string")
        assert MutualInformation(["u", "v"]).calculate(df).value.isFailure


class TestRunnerFusionWithExtensions:
    def test_all_extension_analyzers_in_one_run(self, spark):
        df = spark.createDataFrame(
            [
                (1.0, 2.0, "a", "1"),
                (2.0, 4.0, "a", "2"),
                (3.0, 5.0, "b", "x"),
                (4.0, 4.0, "b", "3"),
            ],
            "x double, y double, g string, s string",
        )
        analyzers = [
            Correlation("x", "y"),
            DataTypeHistogram("s"),
            Histogram("g"),
            MutualInformation(["g", "s"]),
            Entropy(["g"]),
        ]
        ctx = do_analysis_run(df, analyzers)
        values = {a.name: m for a, m in ctx.metric_map.items()}
        assert values["Correlation"].value.isSuccess
        assert values["DataTypeHistogram"].value.get() == 0.75
        assert values["Histogram"].value.get() == 0.5
        assert values["MutualInformation"].value.isSuccess
        assert values["Entropy"].value.isSuccess

    def test_composite_check_methods(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)],
            "id long, name string, score double",
        )
        result = (
            VerificationSuite()
            .on_data(df)
            .add_check(
                Check(CheckLevel.ERROR, "composite")
                .is_primary_key("id")
                .are_complete(["id", "name"])
                .have_completeness(["id", "score"], lambda v: v >= 0.6)
                .has_number_of_distinct_values("name", lambda v: v == 3)
            )
            .run()
        )
        assert result.status == CheckStatus.SUCCESS

    def test_is_primary_key_fails_on_duplicates(self, spark):
        df = spark.createDataFrame([(1,), (1,), (2,)], "id long")
        result = (
            VerificationSuite()
            .on_data(df)
            .add_check(
                Check(CheckLevel.ERROR, "pk").is_primary_key("id")
            )
            .run()
        )
        assert result.status == CheckStatus.ERROR

    def test_are_complete_fails_on_null(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None)], "id long, name string"
        )
        result = (
            VerificationSuite()
            .on_data(df)
            .add_check(
                Check(CheckLevel.ERROR, "c").are_complete(["id", "name"])
            )
            .run()
        )
        assert result.status == CheckStatus.ERROR

    def test_where_on_extension_methods(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0, "a"), (2.0, 2.0, "a"), (3.0, -99.0, "b")],
            "x double, y double, g string",
        )
        result = (
            VerificationSuite()
            .on_data(df)
            .add_check(
                Check(CheckLevel.ERROR, "filtered extension")
                .has_correlation("x", "y", lambda v: v > 0.99)
                .where("g == 'a'")
            )
            .run()
        )
        assert result.status == CheckStatus.SUCCESS

    def test_check_methods(self, spark):
        df = spark.createDataFrame(
            [
                (1.0, 2.0, "a", "1"),
                (2.0, 4.0, "b", "2"),
                (3.0, 5.0, "c", "3"),
            ],
            "x double, y double, g string, s string",
        )
        result = (
            VerificationSuite()
            .on_data(df)
            .add_check(
                Check(CheckLevel.ERROR, "extensions")
                .has_correlation("x", "y", lambda v: v > 0.9)
                .has_entropy("g", lambda v: v > 1.0)
                .has_mutual_information("g", "s", lambda v: v > 1.0)
                .has_distinctness("g", lambda v: v == 1.0)
                .has_unique_value_ratio("g", lambda v: v == 1.0)
                .has_approx_count_distinct("g", lambda v: 2 <= v <= 4)
                .has_min_length("s", lambda v: v == 1)
                .has_max_length("s", lambda v: v == 1)
                .has_data_type("s", lambda v: v == 1.0)
            )
            .run()
        )
        failing = [
            r
            for cr in result.check_results.values()
            for r in cr.constraint_results
            if r.status.name != "SUCCESS"
        ]
        assert result.status == CheckStatus.SUCCESS, failing


class TestCustomSql:
    def test_expression_value(self, spark):
        from hooqu_spark.analyzers import CustomSql

        df = spark.createDataFrame(
            [(1.0,), (5.0,), (9.0,)], "price double"
        )
        a = CustomSql("max(price) - min(price)", instance="price_range")
        assert a.calculate(df).value.get() == 8.0

    def test_fuses_with_other_analyzers(self, spark):
        from hooqu_spark.analyzers import CustomSql, Size, do_analysis_run

        df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        ctx = do_analysis_run(
            df, [Size(), CustomSql("sum(v) * 2", instance="double_sum")]
        )
        values = {m.instance: m.value.get() for m in ctx.metric_map.values()}
        assert values == {"*": 2.0, "double_sum": 6.0}

    def test_invalid_expression_is_isolated_failure(self, spark):
        from hooqu_spark.analyzers import CustomSql, Size, do_analysis_run

        df = spark.createDataFrame([(1.0,)], "v double")
        ctx = do_analysis_run(
            df, [Size(), CustomSql("sum(nonexistent_col)")]
        )
        by_name = {m.name: m for m in ctx.metric_map.values()}
        assert by_name["Size"].value.isSuccess
        assert by_name["CustomSql"].value.isFailure

    def test_non_aggregate_expression_is_isolated_failure(self, spark):
        # "v + 1" RESOLVES but is not an aggregate; it must fail this
        # analyzer only, not poison the fused job for everyone
        # (MISSING_GROUP_BY used to escape the per-analyzer guard).
        from hooqu_spark.analyzers import CustomSql, Size, do_analysis_run

        df = spark.createDataFrame([(1.0,)], "v double")
        ctx = do_analysis_run(df, [Size(), CustomSql("v + 1")])
        by_name = {m.name: m for m in ctx.metric_map.values()}
        assert by_name["Size"].value.isSuccess
        assert by_name["CustomSql"].value.isFailure

    def test_where_runs_standalone_prefiltered(self, spark):
        from hooqu_spark.analyzers import CustomSql

        df = spark.createDataFrame(
            [(1.0,), (-2.0,), (3.0,)], "v double"
        )
        metric = CustomSql("sum(v)", where="v > 0").calculate(df)
        assert metric.value.get() == 4.0

    def test_where_in_run_coexists_with_fused(self, spark):
        from hooqu_spark.analyzers import CustomSql, Size, do_analysis_run

        df = spark.createDataFrame(
            [(1.0,), (-2.0,), (3.0,)], "v double"
        )
        ctx = do_analysis_run(
            df,
            [
                Size(),
                CustomSql("sum(v)", instance="pos_sum", where="v > 0"),
                CustomSql("sum(v)", instance="all_sum"),
            ],
        )
        values = {m.instance: m.value.get() for m in ctx.metric_map.values()}
        assert values == {"*": 3.0, "pos_sum": 4.0, "all_sum": 2.0}


class TestMetricsByGroup:
    def test_per_group_equals_direct_groupby(self, spark):
        from hooqu_spark.analyzers import Completeness, Mean, Size
        from hooqu_spark.lineage import metrics_by_group

        df = spark.createDataFrame(
            [
                ("en", 10.0),
                ("en", 20.0),
                ("en", None),
                ("de", 5.0),
                ("de", 7.0),
            ],
            "lang string, score double",
        )
        per = metrics_by_group(
            df, [Size(), Mean("score"), Completeness("score")], "lang"
        )
        en = {m.name: m.value.get() for m in per["en"].values()}
        de = {m.name: m.value.get() for m in per["de"].values()}
        assert en["Size"] == 3.0
        assert en["Mean"] == pytest.approx(15.0)
        assert en["Completeness"] == pytest.approx(2 / 3)
        assert de["Size"] == 2.0
        assert de["Mean"] == pytest.approx(6.0)
        assert de["Completeness"] == 1.0


class TestLineageWithExtensionStates:
    def test_correlation_and_datatype_states_merge_across_buckets(self, spark):
        from hooqu_spark.lineage import (
            analyzer_key,
            compute_partition_states,
            merge_states,
            metrics_from_states,
        )

        df = spark.createDataFrame(
            [
                (i % 3, float(i), 2.0 * i + (i % 5), str(i if i % 2 else "x"))
                for i in range(30)
            ],
            "bucket int, x double, y double, s string",
        )
        analyzers = [Correlation("x", "y"), DataTypeHistogram("s")]
        records = compute_partition_states(df, analyzers, "bucket")
        merged = merge_states(records)
        metrics = metrics_from_states(analyzers, merged)
        whole_corr = Correlation("x", "y").calculate(df).value.get()
        got_corr = metrics[analyzers[0]].value.get()
        assert got_corr == pytest.approx(whole_corr, rel=1e-12)
        whole_dt = DataTypeHistogram("s").calculate(df).value.get()
        assert metrics[analyzers[1]].value.get() == pytest.approx(whole_dt)
        assert analyzer_key(analyzers[0]).startswith("Correlation|x,y")


class TestIvfTopk:
    def test_recall_vs_brute_force(self, spark):
        from hooqu_spark.ops import brute_force_topk, ivf_topk

        rng = np.random.RandomState(0)
        mat = rng.standard_normal((300, 16))
        rows = [(i, [float(x) for x in mat[i]]) for i in range(300)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = mat[5].tolist()
        exact = {
            r["vec_id"] for r in brute_force_topk(vecs, q, k=10).collect()
        }
        approx = {
            r["vec_id"]
            for r in ivf_topk(
                vecs, q, k=10, n_centroids=8, n_probe=4
            ).collect()
        }
        assert len(approx & exact) >= 7  # recall@10 >= 0.7 at half probing

    def test_multiprobe_improves_recall(self, spark):
        from hooqu_spark.ops import brute_force_topk
        from hooqu_spark.ops.similarity import lsh_bucketed_topk

        rng = np.random.RandomState(3)
        mat = rng.standard_normal((400, 16))
        rows = [(i, [float(x) for x in mat[i]]) for i in range(400)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = mat[9].tolist()
        exact = {r["vec_id"] for r in brute_force_topk(vecs, q, k=10).collect()}

        def recall(n_probes):
            got = {
                r["vec_id"]
                for r in lsh_bucketed_topk(
                    vecs, q, k=10, n_planes=8, n_probes=n_probes
                ).collect()
            }
            return len(got & exact)

        # recall is monotone in probes and substantial at 64/256 buckets
        r1, r8, r64 = recall(1), recall(8), recall(64)
        assert r1 <= r8 <= r64
        assert r64 >= 5

    def test_multiprobe_bucket_enumeration(self):
        from hooqu_spark.ops.similarity import (
            _multiprobe_buckets,
            _projection_planes,
        )

        q = np.ones(16)
        planes = _projection_planes(16, 8, seed=13)
        probes = _multiprobe_buckets(q, planes, 6)
        assert len(probes) == 6
        assert len(set(probes)) == 6  # distinct codes
        # first entry is always the query's own bucket
        weights = 1 << np.arange(8, dtype=np.int64)
        base = int((((q @ planes) > 0) * weights).sum())
        assert probes[0] == base

    def test_full_probe_is_exact(self, spark):
        from hooqu_spark.ops import brute_force_topk, ivf_topk

        rng = np.random.RandomState(1)
        mat = rng.standard_normal((100, 8))
        rows = [(i, [float(x) for x in mat[i]]) for i in range(100)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = mat[0].tolist()
        exact = [r["vec_id"] for r in brute_force_topk(vecs, q, k=5).collect()]
        full = [
            r["vec_id"]
            for r in ivf_topk(vecs, q, k=5, n_centroids=4, n_probe=4).collect()
        ]
        assert full == exact
