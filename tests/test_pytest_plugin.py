"""The mandatory fail-fast pytest plugin (reference
_pytest_plugin.py:104-122,287-318), exercised in a subprocess the way
the reference tests CLI behavior (tests/test_past_subprocesses.py).
No Spark session needed."""

import subprocess
import sys
import textwrap

REPO = "/root/repo"

TESTFILE = textwrap.dedent(
    """
    import pytest

    @pytest.mark.mandatory
    def test_mandatory_fails():
        assert False

    def test_after():
        assert True
    """
)


def _run(tmp_path, *extra):
    f = tmp_path / "test_mandatory_probe.py"
    f.write_text(TESTFILE)
    return subprocess.run(
        [
            sys.executable, "-m", "pytest",
            "-p", "datatest_spark.pytest_plugin",
            "-p", "no:cacheprovider",
            "-q", str(f), *extra,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


def test_mandatory_failure_stops_session(tmp_path):
    r = _run(tmp_path)
    out = r.stdout + r.stderr
    assert "1 failed" in out, out
    assert "1 passed" not in out, out  # test_after never ran
    assert "mandatory" in out, out  # shouldfail reason surfaces


def test_ignore_mandatory_continues(tmp_path):
    r = _run(tmp_path, "--ignore-mandatory")
    out = r.stdout + r.stderr
    assert "1 failed" in out, out
    assert "1 passed" in out, out  # session continued
