"""Test-frontend helpers — the DataTestCase surface
(reference datatest/case.py:26-152) for pytest-style suites.

``assert_valid(df, requirement, ...)`` mirrors
``DataTestCase.assertValid``; ``mandatory`` marks rules that gate the
rest of a checkpointed run (reference runner.py:19-31 fail-fast).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame

from .requirements import Rule
from .validation import ValidationError, validate

__all__ = ["assert_valid", "assert_invalid", "mandatory"]


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


def mandatory(rule: Rule) -> Rule:
    """Mark a rule mandatory (reference @mandatory, runner.py:19-31):
    checkpointed runs evaluate mandatory rules first and gate failing
    partitions out of the remaining rules (plans/checkpoint.py)."""
    rule.mandatory = True
    return rule
