"""Port of hooqu/tests/test_sample.py — the README end-to-end example."""

from hooqu_spark.checks import Check, CheckLevel, CheckStatus
from hooqu_spark.constraints import ConstraintStatus
from hooqu_spark.verification_suite import VerificationSuite


def test_sample(spark):
    df = spark.createDataFrame(
        [
            (1, "Thingy A", "awesome thing.", "high", 0),
            (2, "Thingy B", "available at http://thingb.com", None, 0),
            (3, None, None, "low", 5),
            (4, "Thingy D", "checkout https://thingd.ca", "low", 10),
            (5, "Thingy E", None, "high", 12),
        ],
        "id long, productName string, description string, "
        "priority string, numViews long",
    )

    verification_result = (
        VerificationSuite()
        .on_data(df)
        .add_check(
            Check(CheckLevel.ERROR, "Basic Check")
            .has_size(lambda sz: sz == 5)
            .is_complete("id")
            .is_unique("id")
            .is_complete("productName")  # fails: 4/5
            .is_contained_in("priority", ("high", "low"))
            .is_non_negative("numViews")
            .contains_url("description", lambda d: d >= 0.5)  # fails: 2/5
            .has_quantile("numViews", 0.5, lambda v: v <= 10)
        )
        .run()
    )

    assert verification_result.status == CheckStatus.ERROR

    failures = [
        str(cr.constraint)
        for check_result in verification_result.check_results.values()
        for cr in check_result.constraint_results
        if cr.status != ConstraintStatus.SUCCESS
    ]
    assert any("Completeness" in f or "productName" in f for f in failures)
