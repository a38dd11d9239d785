"""Acceptance semantics (mirrors reference tests/test_acceptances.py:130-1307).

Covers both forms: the driver-side protocol (context-manager parity)
and the DataFrame masks (scale path) where implemented.
"""

import pytest

from datatest_spark import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    ValidationError,
    accepted,
    validate,
)
from datatest_spark.schema import VIOLATION_SCHEMA
from tests.conftest import df_from


class TestAcceptedClass:
    def test_accept_class_suppresses(self, spark):
        df = df_from(spark, [1, 2, 3, 5])
        with accepted(Missing) | accepted(Extra):
            validate(df, {1, 2, 3, 4}, column="value")

    def test_accept_class_partial(self, spark):
        df = df_from(spark, [1, 2, 3, 5])
        with pytest.raises(ValidationError) as exc:
            with accepted(Missing):
                validate(df, {1, 2, 3, 4}, column="value")
        assert exc.value.differences == [Extra(5)]


class TestAcceptedInstance:
    def test_exact_instance(self, spark):
        df = df_from(spark, [1, 2, 3, 5])
        with pytest.raises(ValidationError) as exc:
            with accepted(Missing(4)):
                validate(df, {1, 2, 3, 4}, column="value")
        assert exc.value.differences == [Extra(5)]

    def test_element_scope_accepts_all_matches(self):
        # element scope: every equal diff accepted (acceptances.py:318-321)
        a = accepted(Extra(3), scope="element")
        remaining = a.filter_differences([Extra(3), Extra(3), Missing(1)])
        assert remaining == [Missing(1)]

    def test_collection_consumes_one_per_match(self):
        # group scope default for collections: one allowance per match
        a = accepted([Extra(3)])
        remaining = a.filter_differences([Extra(3), Extra(3)])
        assert remaining == [Extra(3)]

    def test_mapping_allowances(self):
        a = accepted({"A": Extra(3), "B": [Missing(1), Missing(2)]})
        diffs = {"A": [Extra(3), Extra(4)], "B": [Missing(1), Missing(2)]}
        remaining = a.filter_differences(diffs)
        assert remaining == {"A": Extra(4)}


class TestKeysArgs:
    def test_keys_predicate(self):
        a = accepted.keys("A")
        remaining = a.filter_differences({"A": Extra(1), "B": Extra(2)})
        assert remaining == {"B": Extra(2)}

    def test_keys_callable(self):
        a = accepted.keys(lambda k: k.startswith("A"))
        remaining = a.filter_differences({"AA": Extra(1), "B": Extra(2)})
        assert remaining == {"B": Extra(2)}

    def test_args_predicate(self):
        a = accepted.args(3)
        remaining = a.filter_differences([Extra(3), Extra(4)])
        assert remaining == [Extra(4)]

    def test_args_tuple(self):
        a = accepted.args((-2, 5))
        remaining = a.filter_differences([Deviation(-2, 5), Deviation(1, 5)])
        assert remaining == [Deviation(1, 5)]


class TestTolerance:
    def test_deviation_within(self):
        a = accepted.tolerance(2)
        remaining = a.filter_differences(
            [Deviation(-1, 5), Deviation(2, 5), Deviation(3, 5)]
        )
        assert remaining == [Deviation(3, 5)]

    def test_asymmetric_bounds(self):
        a = accepted.tolerance(0, 3)
        remaining = a.filter_differences([Deviation(-1, 5), Deviation(2, 5)])
        assert remaining == [Deviation(-1, 5)]

    def test_derive_from_missing(self):
        # Missing(2) derives deviation=-2 (acceptances.py:600-606)
        a = accepted.tolerance(2)
        assert a.filter_differences([Missing(2)]) == []
        assert a.filter_differences([Missing(3)]) == [Missing(3)]

    def test_derive_from_extra(self):
        a = accepted.tolerance(2)
        assert a.filter_differences([Extra(2)]) == []
        assert a.filter_differences([Extra(3)]) == [Extra(3)]

    def test_non_numeric_rejected(self):
        a = accepted.tolerance(2)
        assert a.filter_differences([Extra("x")]) == [Extra("x")]

    def test_spark_path(self, spark):
        df = df_from(spark, [4, 5, 6, 20])
        res = validate.interval(df, min=5, max=9, column="value",
                                raise_on_failure=False)
        remaining = accepted.tolerance(2).filter_df(res.violations)
        rows = remaining.collect()
        assert len(rows) == 1
        assert rows[0]["deviation"] == 11.0


class TestPercent:
    def test_percent_bounds(self):
        a = accepted.percent(0.2)
        remaining = a.filter_differences(
            [Deviation(1, 10), Deviation(4, 10)]
        )
        assert remaining == [Deviation(4, 10)]

    def test_zero_expected(self):
        # zero expected accepts only zero deviation (acceptances.py:655-657)
        a = accepted.percent(0.5)
        remaining = a.filter_differences([Extra(3)])  # expected derives to 0
        assert remaining == [Extra(3)]

    def test_spark_path(self, spark):
        df = df_from(spark, [10.5, 16.0])
        res = validate.approx(df, 10, delta=0.001, column="value",
                              raise_on_failure=False)
        remaining = accepted.percent(0.1).filter_df(res.violations)
        assert remaining.count() == 1


class TestFuzzyAcceptance:
    def test_fuzzy_accepts_close_strings(self):
        a = accepted.fuzzy(cutoff=0.6)
        remaining = a.filter_differences(
            [Invalid("axc", "abc"), Invalid("xxx", "abc")]
        )
        assert remaining == [Invalid("xxx", "abc")]


class TestCount:
    def test_whole_count(self):
        a = accepted.count(2)
        remaining = a.filter_differences([Extra(1), Extra(2), Extra(3)])
        assert remaining == [Extra(3)]

    def test_group_count(self):
        a = accepted.count(1, scope="group")
        diffs = {"A": [Extra(1), Extra(2)], "B": [Extra(3), Extra(4)]}
        remaining = a.filter_differences(diffs)
        assert remaining == {"A": Extra(2), "B": Extra(4)}

    def test_spark_count(self, spark):
        df = df_from(spark, [10, 11, 12])
        res = validate(df, {1}, column="value", raise_on_failure=False)
        remaining = accepted.count(2).filter_df(res.violations)
        # 4 violations (Missing(1) + 3 Extras) - 2 accepted = 2 remain
        assert remaining.count() == 2


class TestComposition:
    def test_intersection(self):
        a = accepted(Extra) & accepted.args(lambda v: v > 2)
        remaining = a.filter_differences([Extra(1), Extra(3), Missing(9)])
        assert remaining == [Extra(1), Missing(9)]

    def test_union(self):
        a = accepted(Missing) | accepted.args(3)
        remaining = a.filter_differences([Extra(3), Extra(4), Missing(1)])
        assert remaining == [Extra(4)]

    def test_scope_precedence_ordering(self):
        # element-scope operand must be consulted first so the stateful
        # count operand is not consumed needlessly (acceptances.py:269-303)
        a = accepted.count(1) | accepted(Extra)
        remaining = a.filter_differences([Extra(1), Extra(2), Missing(3)])
        # both Extras go to the element acceptance; count consumes Missing
        assert remaining == []

    def test_spark_union(self, spark):
        df = df_from(spark, [1, 2, 3, 5])
        res = validate(df, {1, 2, 3, 4}, column="value", raise_on_failure=False)
        a = accepted(Missing) | accepted(Extra)
        assert a.filter_df(res.violations).count() == 0


class TestContextManagerNesting:
    def test_nested_acceptances(self, spark):
        df = df_from(spark, [1, 2, 3, 5])
        with accepted(Missing(4)):
            with accepted(Extra(5)):
                validate(df, {1, 2, 3, 4}, column="value")

    def test_no_error_passthrough(self, spark):
        df = df_from(spark, [1, 2])
        with accepted(Missing):
            validate(df, {1, 2}, column="value")


class TestAcceptedDifferencesDF:
    """DataFrame compilation of consumption scopes."""

    def test_class_mask(self, spark):
        df = df_from(spark, [1, 2, 3, 5])
        res = validate(df, {1, 2, 3, 4}, column="value", raise_on_failure=False)
        rem = accepted(Missing).filter_df(res.violations)
        rows = rem.collect()
        assert len(rows) == 1 and rows[0]["diff_type"] == "EXTRA"

    def test_instance_mask(self, spark):
        df = df_from(spark, [1, 2, 3, 5])
        res = validate(df, {1, 2, 3, 4}, column="value", raise_on_failure=False)
        rem = accepted(Missing(4)).filter_df(res.violations)
        rows = rem.collect()
        assert len(rows) == 1 and rows[0]["diff_type"] == "EXTRA"

    def test_collection_consumption_mask(self, spark):
        df = df_from(spark, [1, 3, 3, 3])
        res = validate.unique(df, columns=["value"], raise_on_failure=False)
        # 2 Extra(3) violations; allowance covers one
        rem = accepted([Extra(3)]).filter_df(res.violations)
        assert rem.count() == 1
