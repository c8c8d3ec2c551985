"""Metric data model: Try-style value container + typed metrics.

Re-expresses the reference's metric model (``hooqu/metrics.py:8-39``)
without external dependencies: a metric is (entity, name, instance,
value) where ``value`` is a ``Success``/``Failure`` container so that
precondition/compute errors travel as data instead of exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Mapping, Optional, Sequence, Union


class Try:
    """Minimal Success/Failure monad (driver-side only)."""

    __slots__ = ()

    @property
    def isSuccess(self) -> bool:
        return isinstance(self, Success)

    @property
    def isFailure(self) -> bool:
        return isinstance(self, Failure)


@dataclass(frozen=True)
class Success(Try):
    _value: Any

    def get(self) -> Any:
        return self._value

    def getOrElse(self, default: Any = None) -> Any:
        return self._value

    def failed(self) -> "Success":
        raise TypeError("Success.failed() is undefined")

    def __repr__(self) -> str:
        return f"Success({self._value!r})"


class Failure(Try):
    __slots__ = ("exception",)

    def __init__(self, exception: BaseException):
        self.exception = exception

    def get(self) -> Any:
        raise self.exception

    def getOrElse(self, default: Any = None) -> Any:
        return default

    def failed(self) -> Success:
        return Success(self.exception)

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Failure)
            and type(self.exception) is type(other.exception)
            and self.exception.args == other.exception.args
        )

    def __hash__(self) -> int:
        return hash((type(self.exception), repr(self.exception.args)))

    def __repr__(self) -> str:
        return f"Failure({self.exception!r})"


class Entity(Enum):
    DATASET = 0
    COLUMN = 1
    MULTICOLUMN = 2


@dataclass(frozen=True)
class Metric:
    """A named measurement over a dataset/column (``hooqu/metrics.py:17-34``)."""

    entity: Entity
    name: str
    instance: str
    value: Try

    def flatten(self) -> Sequence["Metric"]:
        return (self,)

    def asdict(self) -> Mapping[str, Union[str, Optional[float]]]:
        return {
            "entity": str(self.entity).split(".")[-1],
            "instance": self.instance,
            "name": self.name,
            "value": self.value.getOrElse(None),
        }


class DoubleMetric(Metric):
    def flatten(self) -> Sequence[Metric]:
        return (self,)
