"""working_directory context manager / decorator.

Re-expresses reference _working_directory.py:7-97 from scratch: a
context manager (usable as a decorator, with explicit
``change()``/``revert()`` control) that temporarily switches the
process working directory — a file path switches to the file's
directory.  Re-entry raises, exit restores.

Spark caveat (why SURVEY §2E maps this as mostly-n/a here): it changes
the PYTHON process's cwd only.  ``spark.read.*`` resolves relative
paths against the JVM's ``user.dir`` captured at JVM launch, and
executors against their own work dirs — neither sees ``os.chdir``.
So this helper covers exactly what it covers in the reference: plain
Python file access (``open``, the built-in Excel/DBF parsers in
``sources/formats.py``, checkpoint bookkeeping paths).  Hand
``spark.read`` absolute URIs / catalog tables.
"""

from __future__ import annotations

import os
from contextlib import ContextDecorator

__all__ = ["working_directory"]


class working_directory(ContextDecorator):
    """Temporarily set the working directory to *path* (or, for a file
    path, its directory).  Context manager, decorator, or explicit
    ``change()``/``revert()``."""

    def __init__(self, path: str):
        if os.path.isfile(path):
            path = os.path.dirname(path)
        self._working_dir = os.path.abspath(path)
        self._original_dir: str | None = None

    def __enter__(self):
        if self._original_dir:
            raise RuntimeError(
                f"cannot reenter {self.__class__.__name__}, already "
                f"entered from {self._original_dir!r}"
            )
        self._original_dir = os.path.abspath(os.getcwd())
        os.chdir(self._working_dir)

    def __exit__(self, exc_type, exc_value, traceback):
        if self._original_dir:
            os.chdir(self._original_dir)
            self._original_dir = None

    def change(self) -> None:
        """Enter the context explicitly (raises on double entry)."""
        self.__enter__()

    def revert(self) -> None:
        """Exit the context explicitly (no-op if not entered)."""
        self.__exit__(None, None, None)
