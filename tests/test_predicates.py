"""Predicate compiler semantics (mirrors reference tests/test_predicate.py)."""

import re

import pytest
from pyspark.sql import functions as F

from datatest_spark.predicates import compile_predicate, tuple_expr
from tests.conftest import df_from


def matches(spark, values, pred_obj):
    """Return the subset of values the compiled predicate accepts."""
    df = df_from(spark, values)
    pred = compile_predicate(pred_obj)
    dtype = df.schema["value"].dataType
    rows = df.filter(
        F.coalesce(pred.expr(F.col("value"), dtype), F.lit(False))
    ).collect()
    return [r["value"] for r in rows]


class TestScalarEquality:
    def test_string(self, spark):
        assert matches(spark, ["a", "b"], "a") == ["a"]

    def test_number(self, spark):
        assert matches(spark, [1, 2], 1) == [1]

    def test_null_not_equal(self, spark):
        assert matches(spark, ["a", None], "a") == ["a"]


class TestWildcardAndBool:
    def test_ellipsis_matches_all(self, spark):
        assert matches(spark, [1, 2, 3], ...) == [1, 2, 3]

    def test_true_truthy_numeric(self, spark):
        assert matches(spark, [0, 1, 2], True) == [1, 2]

    def test_true_truthy_string(self, spark):
        assert matches(spark, ["", "x"], True) == ["x"]

    def test_false_falsy(self, spark):
        assert matches(spark, [0, 1], False) == [0]


class TestSetMembership:
    def test_isin(self, spark):
        assert matches(spark, [1, 2, 3], {1, 3}) == [1, 3]


class TestRegex:
    def test_search_semantics(self, spark):
        # reference uses re.search (unanchored) — predicate.py:80-86
        assert matches(spark, ["xfoox", "bar"], re.compile("foo")) == ["xfoox"]

    def test_ignorecase_flag(self, spark):
        assert matches(spark, ["FOO", "bar"], re.compile("foo", re.I)) == ["FOO"]


class TestTypePredicates:
    def test_float_type_on_double_column(self, spark):
        assert matches(spark, [1.5, 2.5], float) == [1.5, 2.5]

    def test_int_type_on_long_column(self, spark):
        assert matches(spark, [1, 2], int) == [1, 2]

    def test_str_type_on_string_column(self, spark):
        assert matches(spark, ["a"], str) == ["a"]

    def test_int_type_rejects_string_column(self, spark):
        assert matches(spark, ["a"], int) == []


class TestCallable:
    def test_vectorized_callable(self, spark):
        assert matches(spark, [1, 2, 3, 4], lambda x: x % 2 == 0) == [2, 4]

    def test_exception_is_false(self, spark):
        assert matches(spark, [0, 1], lambda x: 1 / x > 0) == [1]


class TestNaN:
    def test_nan_literal(self, spark):
        got = matches(spark, [1.0, float("nan")], float("nan"))
        assert len(got) == 1


class TestCombinators:
    def test_invert(self, spark):
        pred = ~compile_predicate({1, 2})
        df = df_from(spark, [1, 2, 3])
        rows = df.filter(pred.expr(F.col("value"))).collect()
        assert [r["value"] for r in rows] == [3]

    def test_and_or(self, spark):
        even = compile_predicate(lambda x: x % 2 == 0)
        big = compile_predicate(lambda x: x > 2)
        df = df_from(spark, [1, 2, 3, 4])
        both = df.filter((even & big).expr(F.col("value"))).collect()
        assert [r["value"] for r in both] == [4]
        either = df.filter((even | big).expr(F.col("value"))).collect()
        assert [r["value"] for r in either] == [2, 3, 4]


class TestTuplePredicate:
    def test_componentwise(self, spark):
        df = spark.createDataFrame(
            [("x", 1), ("x", 2), ("y", 1)], "a string, b long"
        )
        pred = compile_predicate(("x", 1))
        rows = df.filter(
            tuple_expr(pred, [F.col("a"), F.col("b")])
        ).collect()
        assert len(rows) == 1 and rows[0]["a"] == "x" and rows[0]["b"] == 1

    def test_with_wildcard(self, spark):
        df = spark.createDataFrame(
            [("x", 1), ("y", 2)], "a string, b long"
        )
        pred = compile_predicate((..., 2))
        rows = df.filter(tuple_expr(pred, [F.col("a"), F.col("b")])).collect()
        assert [r["a"] for r in rows] == ["y"]


class TestCustomDifferences:
    """Helper functions may return a difference object instead of
    False; it replaces the auto-generated one (reference
    docs/how-to/customize-differences.rst)."""

    def _df(self, spark):
        return spark.createDataFrame(
            [("CAPE GIRARDEAU",), ("GREENE ",), ("JACKSON",), ("st. louis",)],
            "county string",
        )

    def test_returned_invalid_replaces_default(self, spark):
        from datatest_spark import Invalid, validate, ValidationError

        def wellformed(x):
            if x != " ".join(x.split()):
                return Invalid(x, x.strip())  # custom: show the fix
            return x.isupper()

        with pytest.raises(ValidationError) as exc:
            validate(self._df(spark), wellformed, column="county")
        rows = {r.invalid: r for r in exc.value.violations_df.collect()}
        custom = rows["GREENE "]
        assert custom.diff_type == "INVALID" and custom.expected == "GREENE"
        default = rows["st. louis"]
        assert default.diff_type == "INVALID" and default.expected is None

    def test_returned_deviation_carries_numbers(self, spark):
        from datatest_spark import Deviation, validate, ValidationError

        def near_hundred(x):
            if abs(x - 100) <= 5:
                return True
            return Deviation(x - 100, 100)

        df = spark.createDataFrame([(98,), (112,), (91,)], "v long")
        with pytest.raises(ValidationError) as exc:
            validate(df, near_hundred, column="v")
        rows = sorted(exc.value.violations_df.collect(),
                      key=lambda r: r.deviation)
        assert [r.diff_type for r in rows] == ["DEVIATION", "DEVIATION"]
        assert rows[0].deviation == -9.0 and rows[0].expected_num == 100.0
        assert rows[1].deviation == 12.0 and rows[1].expected == "100"

    def test_returned_missing_extra_shapes(self, spark):
        from datatest_spark import Extra, Missing, validate, ValidationError

        def f(x):
            if x == "m":
                return Missing("wanted")
            if x == "e":
                return Extra(x)
            return True

        df = spark.createDataFrame([("m",), ("e",), ("ok",)], "v string")
        with pytest.raises(ValidationError) as exc:
            validate(df, f, column="v")
        by = {r.diff_type: r for r in exc.value.violations_df.collect()}
        assert by["MISSING"].expected == "wanted" and by["MISSING"].invalid is None
        assert by["EXTRA"].invalid == "e"

    def test_difference_is_never_truthy_pass(self, spark):
        from datatest_spark import Invalid, valid

        df = spark.createDataFrame([("x",)], "v string")
        assert valid(df, lambda x: Invalid(x), column="v") is False

    def test_single_arrow_stage(self, spark):
        from datatest_spark import Invalid
        from datatest_spark import requirements as R
        from datatest_spark.validation import Engine

        df = spark.createDataFrame([("x",)], "v string")
        v = Engine(spark).compile(df, [R.predicate("v", lambda s: Invalid(s))])
        plan = v._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        assert "BatchEvalPython" not in plan
