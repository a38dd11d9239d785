"""Test-frontend helpers — the DataTestCase surface
(reference datatest/case.py:26-152) for pytest-style suites.

``assert_valid(df, requirement, ...)`` mirrors
``DataTestCase.assertValid``; ``mandatory`` marks rules that gate the
rest of a checkpointed run (reference runner.py:19-31 fail-fast).
"""

from __future__ import annotations

import unittest
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame

from .acceptances import accepted
from .requirements import Rule
from .validation import ValidationError, validate

__all__ = ["assert_valid", "assert_invalid", "mandatory", "DataTestCase"]


def assert_valid(df: DataFrame, requirement: Any = None, msg: Optional[str] = None,
                 **kwargs) -> None:
    """assertValid equivalent: raises ValidationError on failure."""
    validate(df, requirement, msg=msg, **kwargs)


def assert_invalid(df: DataFrame, requirement: Any = None, **kwargs):
    """Inverse helper for tests: returns the differences, raises
    AssertionError when validation unexpectedly PASSES."""
    try:
        validate(df, requirement, **kwargs)
    except ValidationError as e:
        return e.differences
    raise AssertionError("expected validation to fail, but it passed")


class DataTestCase(unittest.TestCase):
    """unittest-style wrapper (reference datatest/case.py:26-152):
    camelCase assert methods delegating to the :func:`validate` façade
    plus ``accepted*`` conveniences returning the engine's acceptance
    context managers.  Failures raise :class:`ValidationError` — an
    ``AssertionError`` subclass, so unittest reports them as test
    FAILURES, not errors, exactly like the reference.

    The reference's separate ``DataTestRunner``/``DataTestProgram``
    CLI plumbing (runner.py:91-123, main.py) is intentionally out of
    scope: its only behavior beyond stock unittest is @mandatory
    fail-fast and source-line test ordering, which this engine ships
    as the pytest plugin (pytest_plugin.py) and checkpointed-run
    gating (plans/checkpoint.py).  A DataTestCase works under plain
    ``python -m unittest`` and under pytest alike.
    """

    def assertValid(self, data, requirement=None, msg=None, **kw):
        validate(data, requirement, msg=msg, **kw)

    def assertValidPredicate(self, data, requirement, msg=None, **kw):
        validate.predicate(data, requirement, msg=msg, **kw)

    def assertValidRegex(self, data, requirement, flags=0, msg=None, **kw):
        validate.regex(data, requirement, flags=flags, msg=msg, **kw)

    def assertValidApprox(self, data, requirement, places=None, msg=None,
                          delta=None, **kw):
        validate.approx(data, requirement,
                        places=7 if places is None else places,
                        delta=delta, msg=msg, **kw)

    def assertValidFuzzy(self, data, requirement, cutoff=0.6, msg=None, **kw):
        validate.fuzzy(data, requirement, cutoff=cutoff, msg=msg, **kw)

    def assertValidInterval(self, data, min=None, max=None, msg=None, **kw):
        validate.interval(data, min=min, max=max, msg=msg, **kw)

    def assertValidSet(self, data, requirement, msg=None, **kw):
        validate.set(data, requirement, msg=msg, **kw)

    def assertValidSubset(self, data, requirement, msg=None, **kw):
        validate.subset(data, requirement, msg=msg, **kw)

    def assertValidSuperset(self, data, requirement, msg=None, **kw):
        validate.superset(data, requirement, msg=msg, **kw)

    def assertValidUnique(self, data, columns=None, msg=None, **kw):
        validate.unique(data, columns=columns, msg=msg, **kw)

    def assertValidOrder(self, data, sequence, msg=None, **kw):
        validate.order(data, sequence, msg=msg, **kw)

    # acceptance conveniences (reference case.py:116-152) — thin
    # delegations; *msg* is accepted for signature parity and unused,
    # as in the reference.
    def accepted(self, obj, msg=None, scope=None):
        return accepted(obj, scope=scope)

    def acceptedKeys(self, predicate, msg=None):
        return accepted.keys(predicate)

    def acceptedArgs(self, predicate, msg=None):
        return accepted.args(predicate)

    def acceptedTolerance(self, lower, upper=None, msg=None):
        return accepted.tolerance(lower, upper)

    def acceptedPercent(self, lower, upper=None, msg=None):
        return accepted.percent(lower, upper)

    def acceptedFuzzy(self, cutoff=0.6, msg=None):
        return accepted.fuzzy(cutoff=cutoff)

    def acceptedCount(self, number, msg=None, scope=None):
        return accepted.count(number, scope=scope)


def mandatory(rule: Rule) -> Rule:
    """Mark a rule mandatory (reference @mandatory, runner.py:19-31):
    checkpointed runs evaluate mandatory rules first and gate failing
    partitions out of the remaining rules (plans/checkpoint.py)."""
    rule.mandatory = True
    return rule
