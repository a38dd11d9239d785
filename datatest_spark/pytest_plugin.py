"""pytest integration: ``mandatory`` fail-fast marker.

Mirrors the reference plugin's mandatory handling
(datatest/_pytest_plugin.py:104-122,287-318): a test marked
``@pytest.mark.mandatory`` that fails stops the whole session
immediately (``session.shouldfail``), unless ``--ignore-mandatory`` is
given.  This is the test-suite twin of the engine-side ``mandatory``
rule gating (case.py / plans/checkpoint.py): suites ported from
datatest keep their fail-fast semantics.

This environment installs no setuptools entry points, so register the
plugin explicitly:

* ``pytest -p datatest_spark.pytest_plugin ...`` on the command line, or
* ``pytest_plugins = ["datatest_spark.pytest_plugin"]`` in a top-level
  ``conftest.py``.
"""

from __future__ import annotations

import pytest

MANDATORY_MARKER = "mandatory"


def pytest_addoption(parser):
    group = parser.getgroup("datatest")
    try:
        group.addoption(
            "--ignore-mandatory",
            action="store_true",
            help=(
                "ignore 'mandatory' marker (continue testing even when "
                "a mandatory test fails)."
            ),
        )
    except ValueError as exc:  # already added (plugin registered twice)
        if "already added" not in str(exc):
            raise


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "mandatory: fail the whole session as soon as this test fails "
        "(datatest parity); disable with --ignore-mandatory",
    )


@pytest.hookimpl(tryfirst=True, hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield  # noqa: F841 — report construction proceeds normally
    if call.when == "call" and call.excinfo is not None:
        marked = (
            item.get_closest_marker(MANDATORY_MARKER)
            if hasattr(item, "get_closest_marker")
            else None
        )
        if marked and not item.config.getoption("--ignore-mandatory"):
            item.session.shouldfail = "mandatory {!r} failed".format(item.name)
