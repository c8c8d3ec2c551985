"""Tests for the pandas-eval -> Spark SQL expression translator."""

import pytest
from pyspark.sql import functions as F

from hooqu_spark.expr import translate


@pytest.mark.parametrize(
    "src, expected",
    [
        ("att1 > 3", "att1 > 3"),
        ("item != '6'", "item != '6'"),
        ("att1 > att2", "att1 > att2"),
        ("type == 'valid'", "type == 'valid'"),
        ("`att1`.isna()", "(`att1` IS NULL)"),
        ("`att1`.notna()", "(`att1` IS NOT NULL)"),
        ("att1.isna()", "(att1 IS NULL)"),
        (
            "`priority`.isin(['high', 'low'])",
            "`priority` IN ('high', 'low')",
        ),
        ("`x`.isin((1, 2, 3))", "`x` IN (1, 2, 3)"),
        ("`numViews`.fillna(0) >= 0", "coalesce(`numViews`, 0) >= 0"),
        ("`v`.fillna(1.0) > 0", "coalesce(`v`, 1.0) > 0"),
        (
            "`c`.isna() or `c`.isin([1, 2])",
            "(`c` IS NULL) or `c` IN (1, 2)",
        ),
        ("a > 1 & b < 2", "a > 1  AND  b < 2"),
        ("item==1 or item==2", "item==1 or item==2"),
    ],
)
def test_translate(src, expected):
    assert translate(src) == expected


def test_translated_predicates_evaluate(spark):
    df = spark.createDataFrame(
        [(1, None, "high"), (2, 5.0, "low"), (3, -1.0, None)],
        "id long, v double, priority string",
    )
    sql = translate("`priority`.isna() or `priority`.isin(['high', 'low'])")
    assert df.where(F.expr(sql)).count() == 3

    sql = translate("`v`.fillna(0) >= 0")
    assert df.where(F.expr(sql)).count() == 2

    sql = translate("`v`.notna() and v > 0")
    assert df.where(F.expr(sql)).count() == 1
