"""Difference-object semantics (mirrors reference tests/test_difference.py)."""

import math

import pytest

from datatest_spark import (
    NOVALUE,
    Deviation,
    Extra,
    Invalid,
    Missing,
    make_difference,
)


class TestEquality:
    def test_same_class_same_args(self):
        assert Missing(4) == Missing(4)
        assert Extra("a") == Extra("a")
        assert Invalid("x") == Invalid("x")
        assert Invalid("x", "y") == Invalid("x", "y")
        assert Deviation(-2, 5) == Deviation(-2, 5)

    def test_cross_class_never_equal(self):
        assert Missing(4) != Extra(4)
        assert Invalid(4) != Missing(4)

    def test_different_args(self):
        assert Missing(4) != Missing(5)
        assert Deviation(-2, 5) != Deviation(2, 5)

    def test_nan_token_equality(self):
        nan = float("nan")
        assert Deviation(nan, 5) == Deviation(nan, 5)
        assert Missing(nan) == Missing(nan)
        assert Invalid(nan) == Invalid(nan)

    def test_hashable(self):
        assert len({Missing(4), Missing(4), Extra(5)}) == 2


class TestDeviation:
    def test_zero_deviation_rejected(self):
        with pytest.raises(ValueError):
            Deviation(0, 5)

    def test_nonnumeric_rejected(self):
        with pytest.raises(ValueError):
            Deviation("a", 5)

    def test_bool_rejected(self):
        with pytest.raises(ValueError):
            Deviation(True, 5)

    def test_nan_allowed(self):
        d = Deviation(float("nan"), 5)
        assert math.isnan(d.deviation)

    def test_repr_sign(self):
        assert repr(Deviation(1, 5)) == "Deviation(+1, 5)"
        assert repr(Deviation(-1, 5)) == "Deviation(-1, 5)"


class TestInvalid:
    def test_one_and_two_arg_forms(self):
        assert Invalid("a").args == ("a",)
        assert Invalid("a", "b").args == ("a", "b")
        assert repr(Invalid("a", "b")) == "Invalid('a', expected='b')"

    def test_expected_attr(self):
        assert Invalid("a", "b").expected == "b"
        assert Invalid("a").expected is None


class TestMakeDifference:
    """Dispatch parity with reference differences.py:326-352."""

    def test_missing(self):
        assert make_difference(NOVALUE, 5) == Missing(5)

    def test_extra(self):
        assert make_difference(5, NOVALUE) == Extra(5)

    def test_bool_is_invalid_not_deviation(self):
        assert make_difference(True, 1) == Invalid(True, 1)
        assert make_difference(1, False) == Invalid(1, False)

    def test_numeric_deviation(self):
        assert make_difference(7, 5) == Deviation(2, 5)
        assert make_difference(3, 5) == Deviation(-2, 5)

    def test_zero_deviation_is_none(self):
        assert make_difference(5, 5) is None

    def test_nan_deviation(self):
        d = make_difference(float("nan"), 5)
        assert isinstance(d, Deviation)
        assert math.isnan(d.deviation)

    def test_non_numeric_invalid(self):
        assert make_difference("a", "b") == Invalid("a", "b")
        assert make_difference("a", "b", show_expected=False) == Invalid("a")

    def test_none_vs_number_invalid(self):
        assert make_difference(None, 5) == Invalid(None, 5)
