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


def _viol_df(spark, rows):
    """Build a violation DataFrame from (key, diff) pairs the way the
    engine would emit them — for driver-vs-DF parity checks."""
    from datatest_spark.schema import py_repr

    data = []
    for key, d in rows:
        if isinstance(d, Missing):
            data.append(("r", key, None, "MISSING", None, py_repr(d.args[0]),
                         None, None, None))
        elif isinstance(d, Extra):
            data.append(("r", key, None, "EXTRA", py_repr(d.args[0]), None,
                         None, None, None))
        elif isinstance(d, Deviation):
            data.append(("r", key, None, "DEVIATION", py_repr(d.args[0]),
                         py_repr(d.args[1]), float(d.args[0]),
                         float(d.args[1]), None))
        else:
            exp = py_repr(d.args[1]) if len(d.args) > 1 else None
            data.append(("r", key, None, "INVALID", py_repr(d.args[0]), exp,
                         None, None, None))
    return spark.createDataFrame(data, VIOLATION_SCHEMA)


def _parity(spark, make_acceptance, rows):
    """Assert the driver protocol and the DF mask reject the same
    multiset of differences.  *make_acceptance* is a factory — the two
    paths each get a fresh instance because consumption scopes mutate
    allowance state (reference acceptances.py:398-402 does the same).
    """
    from datatest_spark.validation import row_to_difference

    if any(k is not None for k, _ in rows):
        diffs = {}
        for k, d in rows:
            diffs.setdefault(k, []).append(d)
        remaining = make_acceptance().filter_differences(diffs)
        driver = sorted(
            (k, repr(d))
            for k, v in remaining.items()
            for d in (v if isinstance(v, list) else [v])
        )
    else:
        remaining = make_acceptance().filter_differences([d for _, d in rows])
        driver = sorted((None, repr(d)) for d in remaining)
    got = make_acceptance().filter_df(_viol_df(spark, rows)).collect()
    df_side = sorted((r["key"], repr(row_to_difference(r))) for r in got)
    assert driver == df_side, (driver, df_side)


class TestArgsDF:
    def test_scalar_args_mask(self, spark):
        _parity(spark, lambda: accepted.args(3),
                [(None, Extra(3)), (None, Extra(4)), (None, Missing(3))])

    def test_tuple_args_mask(self, spark):
        _parity(spark, lambda: accepted.args((-2, 5)),
                [(None, Deviation(-2, 5)), (None, Deviation(1, 5)),
                 (None, Invalid("x", "y"))])

    def test_callable_args_mask(self, spark):
        _parity(spark, lambda: accepted.args(lambda v: isinstance(v, int) and v > 2),
                [(None, Extra(1)), (None, Extra(5)), (None, Extra("x"))])

    def test_filter_df_no_collect(self, spark):
        # the args path must be a DF transformation, not a driver loop
        out = accepted.args(3).filter_df(
            _viol_df(spark, [(None, Extra(3)), (None, Extra(4))])
        )
        assert out.columns == [f.name for f in VIOLATION_SCHEMA.fields]


class TestComposedDFParity:
    """Stateful short-circuit parity: composed DF masks must consume
    exactly as the sequential driver protocol does."""

    def test_union_element_first_protects_count(self, spark):
        # element acceptance takes both Extras; count consumes only the
        # Missing → everything accepted (reference precedence semantics)
        rows = [(None, Extra(1)), (None, Extra(2)), (None, Missing(3))]
        _parity(spark, lambda: accepted.count(1) | accepted(Extra), rows)

    def test_union_count_too_small(self, spark):
        rows = [(None, Extra(1)), (None, Missing(3)), (None, Missing(4))]
        _parity(spark, lambda: accepted.count(1) | accepted(Extra), rows)

    def test_intersect_gated_consumption(self, spark):
        # second (collection, consuming) operand must only consume rows
        # the first (class) operand accepted
        rows = [(None, Missing(3)), (None, Extra(3)), (None, Extra(3))]
        _parity(spark, lambda: accepted(Extra) & accepted([Extra(3)]), rows)

    def test_intersect_args_and_count(self, spark):
        rows = [(None, Extra(5)), (None, Extra(6)), (None, Extra(1))]
        _parity(spark, lambda: accepted.args(lambda v: v > 2) & accepted.count(1), rows)

    def test_grouped_collection_parity(self, spark):
        rows = [("A", Extra(3)), ("A", Extra(3)), ("B", Extra(3))]
        _parity(spark, lambda: accepted({"A": Extra(3)}), rows)

    def test_mapping_list_value_consumes(self, spark):
        rows = [("A", Extra(3)), ("A", Extra(3)), ("A", Extra(4))]
        _parity(spark, lambda: accepted({"A": [Extra(3)]}), rows)

    def test_mapping_class_value_unlimited(self, spark):
        rows = [("A", Extra(1)), ("A", Extra(2)), ("B", Extra(3)),
                ("A", Missing(9))]
        _parity(spark, lambda: accepted({"A": Extra}), rows)

    # 3+-operand nesting: the inner mark_df is invoked with the outer's
    # temp column as out_col — per-invocation unique temp names keep the
    # two levels from clobbering each other (reference supports
    # arbitrary nesting, acceptances.py:113-135)
    def test_nested_intersection_inside_union(self, spark):
        rows = [(None, Extra(1)), (None, Extra(2)), (None, Missing(3)),
                (None, Missing(4))]
        _parity(
            spark,
            lambda: (accepted(Extra) & accepted.count(1)) | accepted(Missing),
            rows,
        )

    def test_nested_union_inside_intersection(self, spark):
        rows = [(None, Extra(1)), (None, Extra(2)), (None, Missing(3))]
        _parity(
            spark,
            lambda: (accepted(Missing) | accepted(Extra)) & accepted.count(2),
            rows,
        )

    def test_four_operand_composition(self, spark):
        rows = [(None, Extra(1)), (None, Extra(2)), (None, Missing(3)),
                (None, Deviation(-1, 10)), (None, Deviation(7, 10))]
        _parity(
            spark,
            lambda: (accepted(Missing) | accepted.tolerance(2))
            | (accepted(Extra) & accepted.count(1)),
            rows,
        )


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


class TestWholeScopeCountScale:
    def test_no_unpartitioned_window_in_plan(self, spark):
        """Whole-scope count must NOT compile to a global (empty
        partition-spec) window — that sorts every violation on one
        task.  The scalable form is pid-partitioned windows + a
        driver prefix-sum of per-partition totals."""
        from datatest_spark.acceptances import accepted
        from pyspark.sql import functions as F

        viol = spark.range(500).select(
            F.lit("r").alias("rule_id"), F.lit(None).cast("string").alias("key"),
            F.lit("c").alias("column"), F.lit("DEVIATION").alias("diff_type"),
            F.col("id").cast("string").alias("invalid"),
            F.lit("0").alias("expected"),
            F.col("id").cast("double").alias("deviation"),
            F.lit(0.0).alias("expected_num"),
            F.lit(None).cast("string").alias("partition_id"),
        ).repartition(8)
        marked = accepted.count(100).filter_df(viol)
        plan = marked._jdf.queryExecution().optimizedPlan().toString()

        def bracket_groups(line: str) -> int:
            groups = depth = 0
            for ch in line:
                if ch == "[":
                    if depth == 0:
                        groups += 1
                    depth += 1
                elif ch == "]":
                    depth -= 1
            return groups

        window_lines = [
            ln for ln in plan.splitlines() if ln.lstrip("+-: ").startswith("Window ")
        ]
        assert window_lines, plan  # the running count IS window-based
        for ln in window_lines:
            # logical Window prints `Window [exprs], [partitionSpec],
            # [orderSpec]` — a GLOBAL window omits the partitionSpec
            # group entirely (2 groups instead of 3)
            assert bracket_groups(ln) >= 3, f"global window in plan:\n{ln}"
        from datatest_spark.acceptances import unpersist_cached

        unpersist_cached(blocking=True)

    def test_whole_scope_counts_across_partitions(self, spark):
        """First-N semantics must hold globally (canonical order), not
        per physical partition: with N=7 over 20 violations spread over
        8 input partitions, exactly the 7 canonically-first survive as
        accepted, the other 13 re-raise."""
        from datatest_spark.acceptances import accepted
        from pyspark.sql import functions as F

        viol = spark.range(20).select(
            F.lit("r").alias("rule_id"), F.lit(None).cast("string").alias("key"),
            F.lit("c").alias("column"), F.lit("DEVIATION").alias("diff_type"),
            F.format_string("%03d", F.col("id")).alias("invalid"),
            F.lit("0").alias("expected"),
            (F.col("id") + 1).cast("double").alias("deviation"),
            F.lit(0.0).alias("expected_num"),
            F.lit(None).cast("string").alias("partition_id"),
        ).repartition(8)
        remainder = accepted.count(7).filter_df(viol).collect()
        got = sorted(r["invalid"] for r in remainder)
        # canonical order sorts by ... invalid ("000" < "001" < ...):
        # the first 7 are consumed, 013..019 remain? no — 007..019 remain
        assert got == [f"{i:03d}" for i in range(7, 20)]
        from datatest_spark.acceptances import unpersist_cached

        unpersist_cached(blocking=True)

    def test_composed_whole_scope_counts(self, spark):
        """count(5) & count(10): two whole-scope stateful operands in
        ONE composition — both range-partitioned frames stay alive for
        the duration of the plan (append-only cache registry).  The
        short-circuit means the second consumes only rows the first
        accepted: intersection = the canonically-first 5."""
        from datatest_spark.acceptances import accepted
        from pyspark.sql import functions as F

        viol = spark.range(20).select(
            F.lit("r").alias("rule_id"), F.lit(None).cast("string").alias("key"),
            F.lit("c").alias("column"), F.lit("DEVIATION").alias("diff_type"),
            F.format_string("%03d", F.col("id")).alias("invalid"),
            F.lit("0").alias("expected"),
            (F.col("id") + 1).cast("double").alias("deviation"),
            F.lit(0.0).alias("expected_num"),
            F.lit(None).cast("string").alias("partition_id"),
        ).repartition(8)
        acc = accepted.count(5) & accepted.count(10)
        got = sorted(r["invalid"] for r in acc.filter_df(viol).collect())
        assert got == [f"{i:03d}" for i in range(5, 20)]
        from datatest_spark.acceptances import unpersist_cached

        unpersist_cached(blocking=True)

    def test_shuffle_partitions_conf_not_numeric(self, spark):
        """Platforms with AQE auto-optimized shuffle report
        spark.sql.shuffle.partitions="auto"; the whole-scope counter
        must fall back to defaultParallelism instead of raising."""
        from datatest_spark.acceptances import _shuffle_partitions

        class FakeConf:
            def get(self, key, default=None):
                return "auto"

        class FakeSpark:
            conf = FakeConf()
            sparkContext = spark.sparkContext

        assert _shuffle_partitions(FakeSpark()) == int(
            spark.sparkContext.defaultParallelism
        )
        assert _shuffle_partitions(spark) == 4  # numeric conf unchanged


class TestRandomizedParity:
    """Property test: for RANDOM difference sets and RANDOM acceptance
    compositions, the driver protocol (reference semantics) and the
    DataFrame mask must reject the same multiset.  This is the deepest
    guarantee for the trickiest engine semantics — scope precedence,
    gated consumption, composition short-circuit.

    Inputs are pre-sorted in the DF path's canonical violation order
    (stateful consumption is order-dependent by design; the DF path
    defines the order, so the driver twin must see the same one)."""

    _DT_ORDER = {"Missing": "MISSING", "Extra": "EXTRA",
                 "Invalid": "INVALID", "Deviation": "DEVIATION"}

    @classmethod
    def _canon_key(cls, kd):
        from datatest_spark.schema import py_repr

        key, d = kd
        name = type(d).__name__
        dt = cls._DT_ORDER[name]
        invalid = expected = None
        deviation = None
        if name == "Missing":
            expected = py_repr(d.args[0])
        elif name == "Extra":
            invalid = py_repr(d.args[0])
        elif name == "Deviation":
            invalid = py_repr(d.args[0])
            expected = py_repr(d.args[1])
            deviation = float(d.args[0])
        else:
            invalid = py_repr(d.args[0])
            if len(d.args) > 1:
                expected = py_repr(d.args[1])

        def ns(v):  # NULLS FIRST twin
            return (0, "") if v is None else (1, str(v))

        def nf(v):
            return (0, 0.0) if v is None else (1, float(v))

        return (ns(key), ns(dt), ns(invalid), ns(expected), nf(deviation))

    def test_random_compositions_match(self, spark):
        from hypothesis import given, settings, strategies as st

        from datatest_spark.differences import (
            Deviation, Extra, Invalid, Missing,
        )

        small = st.sampled_from([1, 2, 3])
        diff = st.one_of(
            small.map(Missing),
            small.map(Extra),
            st.tuples(st.sampled_from([-3, -1, 1, 2, 6]),
                      st.sampled_from([5, 10])).map(lambda t: Deviation(*t)),
            small.map(Invalid),
            st.tuples(small, st.sampled_from([7, 8])).map(
                lambda t: Invalid(*t)),
        )

        def atom(draw_i):
            factories = [
                lambda: accepted(Missing),
                lambda: accepted(Extra),
                lambda: accepted(Deviation),
                lambda: accepted(Invalid),
                lambda: accepted(Missing(1)),
                lambda: accepted(Extra(2)),
                lambda: accepted([Missing(1), Missing(1), Extra(2)]),
                lambda: accepted.tolerance(2),
                lambda: accepted.percent(0.3),
                lambda: accepted.keys({"A"}),
                lambda: accepted.count(2),
                lambda: accepted.count(1, scope="group"),
                lambda: accepted.args(
                    lambda a: isinstance(a, tuple) and len(a) == 2
                    and isinstance(a[0], (int, float)) and abs(a[0]) <= 2
                ),
            ]
            return factories[draw_i % len(factories)]

        comp = st.one_of(
            st.integers(0, 12).map(atom),
            st.tuples(st.integers(0, 12), st.integers(0, 12),
                      st.booleans()).map(
                lambda t: (lambda: (atom(t[0])() & atom(t[1])())
                           if t[2] else (atom(t[0])() | atom(t[1])()))
            ),
        )

        @settings(max_examples=15, deadline=None)
        @given(
            rows=st.lists(
                st.tuples(st.sampled_from(["A", "B", "C"]), diff),
                min_size=0, max_size=8,
            ),
            keyed=st.booleans(),
            make=comp,
        )
        def check(rows, keyed, make):
            if not keyed:
                rows = [(None, d) for _, d in rows]
            rows = sorted(rows, key=self._canon_key)
            _parity(spark, make, rows)

        check()
