"""pandas ``.validate`` accessors (reference _pandas_integration.py:17-221).

The reference monkey-patches ``validate`` methods onto pandas
DataFrame/Series/Index.  Here the same surface registers through
pandas' public extension-accessor API and funnels into the Spark
engine: the pandas object hops to Spark over Arrow
(``createDataFrame``), the requirement compiles to the usual plan
fragments, and failures raise the same :class:`ValidationError`.

Usage::

    >>> from datatest_spark.pandas_integration import register_accessors
    >>> register_accessors()
    >>> pdf.validate({"x": {1, 2, 3}}, spark=spark)   # DataFrame
    >>> series.validate({1, 2, 3}, spark=spark)       # Series

Driver-sized pandas data only, by construction — anything bigger is
already a Spark DataFrame and uses :func:`datatest_spark.validate`
directly.
"""

from __future__ import annotations

from typing import Any, Optional

__all__ = ["register_accessors"]

_REGISTERED = False


def _get_spark(spark):
    if spark is not None:
        return spark
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None:
        raise RuntimeError(
            "no active SparkSession; pass spark= to .validate(...)"
        )
    return active


def register_accessors() -> None:
    """Idempotently register ``.validate`` on pandas DataFrame/Series."""
    global _REGISTERED
    if _REGISTERED:
        return
    import pandas as pd

    @pd.api.extensions.register_dataframe_accessor("validate")
    class _DataFrameValidate:  # noqa: F811
        def __init__(self, obj):
            self._obj = obj

        def __call__(self, requirement: Any, spark=None, **kwargs):
            from .validation import validate

            spark = _get_spark(spark)
            return validate(
                spark.createDataFrame(self._obj), requirement, **kwargs
            )

    @pd.api.extensions.register_series_accessor("validate")
    class _SeriesValidate:  # noqa: F811
        def __init__(self, obj):
            self._obj = obj

        def __call__(self, requirement: Any, spark=None,
                     column: Optional[str] = None, **kwargs):
            from .validation import validate

            spark = _get_spark(spark)
            name = column or self._obj.name or "value"
            pdf = self._obj.to_frame(name=name)
            return validate(
                spark.createDataFrame(pdf), requirement, column=name, **kwargs
            )

    _REGISTERED = True
