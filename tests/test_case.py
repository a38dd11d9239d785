"""DataTestCase — the unittest-style wrapper (reference
datatest/case.py:26-152).  Runs a real unittest suite in-process and
checks that ValidationError surfaces as a test FAILURE (AssertionError
subclass), not an error, and that the accepted* conveniences filter
the violation stream exactly like the module-level context managers.
"""

import io
import unittest

from datatest_spark import DataTestCase, Extra


def _run(case_cls):
    suite = unittest.TestLoader().loadTestsFromTestCase(case_cls)
    runner = unittest.TextTestRunner(stream=io.StringIO(), verbosity=0)
    return runner.run(suite)


class TestDataTestCase:
    def test_failures_are_failures_not_errors(self, spark):
        df = spark.createDataFrame([(1,), (2,), (3,)], "x int")

        class T(DataTestCase):
            def test_interval_passes(self):
                self.assertValidInterval(df, min=1, max=3, column="x")

            def test_set_fails(self):
                self.assertValidSet(df, {1, 2}, column="x")

        result = _run(T)
        assert result.testsRun == 2
        assert len(result.errors) == 0
        assert len(result.failures) == 1
        assert "test_set_fails" in result.failures[0][0].id()
        assert "Extra" in result.failures[0][1]

    def test_accepted_conveniences_filter(self, spark):
        df = spark.createDataFrame([(1,), (2,), (3,)], "x int")

        class T(DataTestCase):
            def test_accepted_class(self):
                with self.accepted(Extra):
                    self.assertValidSet(df, {1, 2}, column="x")

            def test_accepted_tolerance(self):
                with self.acceptedTolerance(2):
                    self.assertValidApprox(df, 2, column="x")

        result = _run(T)
        assert result.testsRun == 2
        assert len(result.errors) == 0 and len(result.failures) == 0

    def test_method_delegations(self, spark):
        df = spark.createDataFrame(
            [("a1", 1), ("a2", 2), ("a3", 3)], "s string, x int"
        )

        class T(DataTestCase):
            def test_regex(self):
                self.assertValidRegex(df, r"^a\d$", column="s")

            def test_unique(self):
                self.assertValidUnique(df, columns=["s"])

            def test_subset(self):
                self.assertValidSubset(df, {"a1", "a2", "a3", "a4"},
                                       column="s")

            def test_superset_fails(self):
                self.assertValidSuperset(df, {"a1", "zz"}, column="s")

        result = _run(T)
        assert result.testsRun == 4
        assert len(result.errors) == 0
        assert len(result.failures) == 1
        assert "test_superset_fails" in result.failures[0][0].id()
