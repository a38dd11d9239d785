"""datatest_spark — a PySpark-native schema + constraint validation engine.

From-scratch re-expression of the semantics of shawnbrown/datatest
(reference at /root/reference, v0.12.0.dev1) over Spark DataFrames:
requirement literals compile to Column expressions / join plans, failed
checks become a typed violation-row DataFrame, and acceptances filter
that stream — all designed for 10^12-row tables (one fused scan for row
rules, broadcast/sort-merge anti-joins for referential checks, sketch
aggregates for column profiles).
"""

from .differences import (
    NOVALUE,
    BaseDifference,
    Deviation,
    Extra,
    Invalid,
    Missing,
    make_difference,
)
from .predicates import Predicate, compile_predicate
from .schema import VIOLATION_SCHEMA
from .validation import (
    Engine,
    QuarantineResult,
    ValidationError,
    ValidationResult,
    quarantine,
    valid,
    validate,
)
from . import requirements
from . import acceptances as _acceptances_module  # noqa: F401
from .acceptances import accepted
from .caching import unpersist_result
from .sampling import deterministic_sample, sampled_verdicts
from .case import DataTestCase, assert_invalid, assert_valid, mandatory
from .repeating import RepeatingContainer
from .working_directory import working_directory

__version__ = "0.1.0"

__all__ = [
    "BaseDifference",
    "Missing",
    "Extra",
    "Invalid",
    "Deviation",
    "NOVALUE",
    "make_difference",
    "Predicate",
    "compile_predicate",
    "VIOLATION_SCHEMA",
    "Engine",
    "ValidationError",
    "ValidationResult",
    "validate",
    "valid",
    "quarantine",
    "QuarantineResult",
    "requirements",
    "accepted",
    "DataTestCase",
    "assert_valid",
    "assert_invalid",
    "mandatory",
    "unpersist_result",
    "deterministic_sample",
    "sampled_verdicts",
    "RepeatingContainer",
    "working_directory",
]
