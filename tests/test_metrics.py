"""Port of hooqu/tests/test_metrics.py."""

from hooqu_spark.metrics import DoubleMetric, Entity, Failure, Success


def test_double_metric_should_flatten():
    metric = DoubleMetric(Entity.COLUMN, "metric-name", "instance-name", Success(50))
    assert metric.flatten() == (metric,)

    metric = DoubleMetric(
        Entity.COLUMN, "metric-name", "instance-name", Failure(Exception("sample"))
    )
    assert metric.flatten() == (metric,)


def test_try_semantics():
    s = Success(1.5)
    assert s.isSuccess and not s.isFailure
    assert s.get() == 1.5
    assert s.getOrElse(None) == 1.5

    f = Failure(ValueError("boom"))
    assert f.isFailure and not f.isSuccess
    assert f.getOrElse(None) is None
    assert isinstance(f.failed().get(), ValueError)
    assert Failure(ValueError("boom")) == Failure(ValueError("boom"))
    assert Failure(ValueError("boom")) != Failure(ValueError("bang"))


def test_metric_asdict():
    m = DoubleMetric(Entity.DATASET, "Size", "*", Success(4.0))
    assert m.asdict() == {
        "entity": "DATASET",
        "instance": "*",
        "name": "Size",
        "value": 4.0,
    }
    m = DoubleMetric(Entity.COLUMN, "Minimum", "c", Failure(ValueError("x")))
    assert m.asdict()["value"] is None
