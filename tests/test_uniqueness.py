"""Port of hooqu/tests/test_uniqueness.py."""

import pytest

from hooqu_spark.analyzers import Uniqueness
from hooqu_spark.metrics import DoubleMetric, Entity, Success


@pytest.fixture
def sample_data(spark):
    data = [
        ("India", "Xavier House, 2nd Floor", "St. Peter Colony, Prd", "Bandra (West)"),
        ("India", "503 Godavari", "Sir Pochkhanwala Road", "Worli"),
        ("India", "4/4 Seema Society", "N Dutta Road, Four Bungalows", "Andheri"),
        ("India", "1001D Abhishek Apartments", "Juhu Versova Road", "Andheri"),
        ("India", "95, Hill Road", None, None),
        ("India", "90 Cuffe Parade", "Taj President Hotel", "Cuffe Parade"),
        ("India", "4, Seven PM", "Sir Pochkhanwala Rd", "Worli"),
        ("India", "1453 Sahar Road", None, None),
    ]
    return spark.createDataFrame(
        data,
        "`Country` string, `Address Line 1` string, "
        "`Address Line 2` string, `Address Line 3` string",
    )


def test_uniqueness_should_be_correct_for_a_single_column(sample_data):
    col = "Address Line 1"
    assert Uniqueness([col]).calculate(sample_data) == DoubleMetric(
        Entity.COLUMN, "Uniqueness", col, Success(1.0)
    )


def test_uniqueness_should_be_correct_for_multiple_fields(sample_data):
    cols = ["Address Line 1", "Address Line 3"]
    assert Uniqueness(cols).calculate(sample_data) == DoubleMetric(
        Entity.MULTICOLUMN, "Uniqueness", ",".join(cols), Success(1.0)
    )


def test_filtered_uniqueness(spark):
    df = spark.createDataFrame(
        [
            ("1", "unique"),
            ("2", "unique"),
            ("3", "duplicate"),
            ("3", "duplicate"),
            ("4", "unique"),
        ],
        "value string, type string",
    )
    uniq = Uniqueness(["value"])
    uniq_with_filter = Uniqueness(["value"], "type=='unique'")

    assert uniq.calculate(df) == DoubleMetric(
        Entity.COLUMN, "Uniqueness", "value", Success(0.6)
    )
    assert uniq_with_filter.calculate(df) == DoubleMetric(
        Entity.COLUMN, "Uniqueness", "value", Success(1.0)
    )


def test_uniqueness_all_null_column_fails(spark):
    df = spark.createDataFrame([(None,), (None,)], "v string")
    metric = Uniqueness(["v"]).calculate(df)
    assert metric.value.isFailure  # EmptyStateException


def test_uniqueness_missing_column_fails(spark):
    df = spark.createDataFrame([("a",)], "v string")
    metric = Uniqueness(["nope"]).calculate(df)
    assert metric.value.isFailure
