"""Difference objects — the engine's violation vocabulary.

Re-expresses the semantics of the reference's difference classes
(reference: datatest/differences.py:101-352) from scratch:

* ``Missing(value)``    — required value absent from the data under test.
* ``Extra(value)``      — value present in the data but not required.
* ``Invalid(invalid[, expected])`` — non-quantitative mismatch.
* ``Deviation(deviation, expected)`` — quantitative mismatch,
  ``deviation = actual - expected`` and must be non-zero.

These classes exist for the *driver side*: pytest-parity assertions and
human-readable ``ValidationError`` rendering.  At scale, violations live
in a typed DataFrame (see :mod:`datatest_spark.schema`); these objects
are only materialized when a (truncated) error is rendered or when test
code collects small violation sets.

Semantics preserved from the reference:

* equality is ``type(self) == type(other) and self.args == other.args``
  with NaN treated as equal to NaN via a token substitution
  (reference: datatest/differences.py:29-46,75-92);
* ``Deviation`` rejects zero/empty deviations and non-numeric expected
  values (reference: datatest/differences.py:248-323);
* booleans never participate in Deviation arithmetic — dispatch sends
  them to ``Invalid`` (reference: datatest/differences.py:341-344).
"""

from __future__ import annotations

import math
from numbers import Number
from typing import Any

__all__ = [
    "BaseDifference",
    "Missing",
    "Extra",
    "Invalid",
    "Deviation",
    "NOVALUE",
    "make_difference",
]


class _NoValueType:
    """Sentinel for "no value present" (reference: datatest/differences.py:55-72)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "<no value>"

    def __bool__(self):
        return False


NOVALUE = _NoValueType()


class _NanToken:
    """Token that equals itself, substituted for NaN during comparisons
    (reference: datatest/differences.py:29-46)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "<nan token>"


_NANTOKEN = _NanToken()


def _nan_to_token(x: Any) -> Any:
    try:
        if isinstance(x, float) and math.isnan(x):
            return _NANTOKEN
    except TypeError:
        pass
    try:
        import numpy as np

        if isinstance(x, np.floating) and np.isnan(x):
            return _NANTOKEN
    except Exception:
        pass
    return x


class BaseDifference:
    """Abstract base for all difference objects."""

    __slots__ = ("_args",)

    def __init__(self, *args: Any) -> None:
        if not args:
            raise TypeError(f"{self.__class__.__name__} requires at least one argument")
        self._args = args

    @property
    def args(self) -> tuple:
        return self._args

    def __eq__(self, other: Any) -> bool:
        if other.__class__ is not self.__class__:
            return NotImplemented
        self_args = tuple(_nan_to_token(a) for a in self.args)
        other_args = tuple(_nan_to_token(a) for a in other.args)
        return self_args == other_args

    def __ne__(self, other: Any) -> bool:
        result = self.__eq__(other)
        if result is NotImplemented:
            return True
        return not result

    def __hash__(self) -> int:
        try:
            return hash((self.__class__, tuple(_nan_to_token(a) for a in self.args)))
        except TypeError:
            # unhashable args: fall back to repr-hash (used only in small
            # driver-side sets, never in distributed paths)
            return hash((self.__class__, repr(self.args)))

    def __repr__(self) -> str:
        cls = self.__class__.__name__
        args_repr = ", ".join(repr(a) for a in self.args)
        return f"{cls}({args_repr})"


class Missing(BaseDifference):
    """A required value that was not found in the data."""

    __slots__ = ()

    def __init__(self, value: Any) -> None:
        super().__init__(value)


class Extra(BaseDifference):
    """A value found in the data that was not part of the requirement."""

    __slots__ = ()

    def __init__(self, value: Any) -> None:
        super().__init__(value)


class Invalid(BaseDifference):
    """A value that failed a predicate, non-quantitatively.

    ``expected`` is optional; when present it is excluded from *args-based
    repr only if None* (reference keeps a 1- or 2-arg form,
    datatest/differences.py:164-226).
    """

    __slots__ = ("invalid", "expected")

    def __init__(self, invalid: Any, expected: Any = NOVALUE) -> None:
        if expected is NOVALUE:
            super().__init__(invalid)
        else:
            super().__init__(invalid, expected)
        self.invalid = invalid
        self.expected = None if expected is NOVALUE else expected

    def __repr__(self) -> str:
        if len(self.args) == 1:
            return f"Invalid({self.args[0]!r})"
        return f"Invalid({self.args[0]!r}, expected={self.args[1]!r})"


class Deviation(BaseDifference):
    """A quantitative difference: ``deviation = actual - expected``.

    Zero deviations are not differences; constructing one raises
    (reference: datatest/differences.py:262-289).
    """

    __slots__ = ("deviation", "expected")

    def __init__(self, deviation: Any, expected: Any) -> None:
        dev_is_nan = isinstance(deviation, float) and math.isnan(deviation)
        exp_is_nan = isinstance(expected, float) and math.isnan(expected)

        if isinstance(deviation, bool) or isinstance(expected, bool):
            raise ValueError("deviation and expected may not be bools")
        if not dev_is_nan:
            if not isinstance(deviation, Number) or not deviation:
                raise ValueError(
                    f"deviation must be a non-zero number, got {deviation!r}"
                )
        if not exp_is_nan and expected is not None:
            if not isinstance(expected, Number):
                raise ValueError(f"expected must be a number, got {expected!r}")
        super().__init__(deviation, expected)
        self.deviation = deviation
        self.expected = expected

    def __repr__(self) -> str:
        dev = self.args[0]
        try:
            if dev > 0:
                dev_repr = f"+{dev!r}"
            else:
                dev_repr = repr(dev)
        except TypeError:
            dev_repr = repr(dev)
        return f"Deviation({dev_repr}, {self.args[1]!r})"


def _is_subtractable(x: Any) -> bool:
    return isinstance(x, Number) and not isinstance(x, bool)


def make_difference(actual: Any, expected: Any, show_expected: bool = True):
    """Dispatch a (actual, expected) mismatch to the right difference class.

    Mirrors the reference's centralized dispatch
    (datatest/differences.py:326-352):

    * actual is NOVALUE  → ``Missing(expected)``
    * expected is NOVALUE → ``Extra(actual)``
    * either is a bool   → ``Invalid`` (bools never subtract)
    * both numeric       → ``Deviation(actual - expected, expected)``;
      a zero deviation is not a difference → returns None
    * otherwise          → ``Invalid(actual[, expected])``
    """
    if actual is NOVALUE:
        return Missing(expected)
    if expected is NOVALUE:
        return Extra(actual)
    if isinstance(actual, bool) or isinstance(expected, bool):
        return Invalid(actual, expected) if show_expected else Invalid(actual)
    if _is_subtractable(actual) and _is_subtractable(expected):
        actual_nan = isinstance(actual, float) and math.isnan(actual)
        expected_nan = isinstance(expected, float) and math.isnan(expected)
        if actual_nan or expected_nan:
            return Deviation(float("nan"), expected)
        dev = actual - expected
        if not dev:
            return None  # zero deviation is not a difference
        return Deviation(dev, expected)
    if show_expected:
        return Invalid(actual, expected)
    return Invalid(actual)
