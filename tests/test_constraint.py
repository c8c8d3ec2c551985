"""Port of hooqu/tests/test_constraint.py."""

from typing import cast

from hooqu_spark.constraints import (
    AnalysisBasedConstraint,
    ConstraintDecorator,
    ConstraintResult,
    ConstraintStatus,
    completeness_constraint,
    compliance_constraint,
    max_constraint,
    mean_constraint,
    min_constraint,
    quantile_constraint,
    size_constraint,
    standard_deviation_constraint,
    sum_constraint,
    uniqueness_constraint,
)


def calculate(constraint, df) -> ConstraintResult:
    if isinstance(constraint, ConstraintDecorator):
        constraint = cast(AnalysisBasedConstraint, constraint.inner)
    return constraint.calculate_and_evaluate(df)


def test_completeness_constraint(df_missing):
    df = df_missing
    assert (
        calculate(completeness_constraint("att1", lambda v: v == 0.5), df).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(completeness_constraint("att1", lambda v: v != 0.5), df).status
        == ConstraintStatus.FAILURE
    )
    assert (
        calculate(completeness_constraint("att2", lambda v: v == 0.75), df).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(completeness_constraint("att2", lambda v: v != 0.75), df).status
        == ConstraintStatus.FAILURE
    )


def test_basic_stats_constraints(df_with_numeric_values):
    df = df_with_numeric_values
    assert (
        calculate(min_constraint("att1", lambda v: v == 1.0), df).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(max_constraint("att1", lambda v: v == 6.0), df).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(mean_constraint("att1", lambda v: v == 3.5), df).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(sum_constraint("att1", lambda v: v == 21.0), df).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(
            standard_deviation_constraint("att1", lambda v: v == 1.707825127659933),
            df,
        ).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(quantile_constraint("att1", 0.5, lambda v: v == 3.0), df).status
        == ConstraintStatus.SUCCESS
    )


def test_size_constraint(df_missing):
    df = df_missing
    assert (
        calculate(size_constraint(lambda v: v == 12), df).status
        == ConstraintStatus.SUCCESS
    )


def test_compliance_constraint(df_with_numeric_values):
    df = df_with_numeric_values
    assert (
        calculate(
            compliance_constraint("rule1", "att1 > 2 ", lambda pct: pct >= 0.6), df
        ).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(
            compliance_constraint("rule1", "att1 > 2 ", lambda pct: pct >= 0.9), df
        ).status
        == ConstraintStatus.FAILURE
    )


def test_uniqueness_constraint(spark):
    df_nunique = spark.createDataFrame(
        [(0,), (1,), (2,), (5,), (5,)], "att1 long"
    )
    df_unique = spark.createDataFrame([(i,) for i in range(10)], "att1 long")

    assert (
        calculate(uniqueness_constraint(["att1"], lambda v: v > 0.2), df_nunique).status
        == ConstraintStatus.SUCCESS
    )
    assert (
        calculate(
            uniqueness_constraint(["att1"], lambda v: v == 1.0), df_nunique
        ).status
        == ConstraintStatus.FAILURE
    )
    assert (
        calculate(uniqueness_constraint(["att1"], lambda v: v == 1.0), df_unique).status
        == ConstraintStatus.SUCCESS
    )


def test_missing_analysis_and_assertion_exception(df_full):
    c = cast(
        AnalysisBasedConstraint,
        cast(ConstraintDecorator, min_constraint("item", lambda v: v == 1.0)).inner,
    )
    # evaluating against an empty analysis result -> missing analysis
    result = c.evaluate({})
    assert result.status == ConstraintStatus.FAILURE
    assert "Missing Analysis" in result.message

    # assertion raising -> FAILURE with assertion-exception message
    def boom(v):
        raise RuntimeError("nope")

    c2 = cast(
        AnalysisBasedConstraint,
        cast(ConstraintDecorator, min_constraint("item", boom)).inner,
    )
    result2 = c2.calculate_and_evaluate(df_full)
    assert result2.status == ConstraintStatus.FAILURE
    assert "Can't execute the assertion" in result2.message
