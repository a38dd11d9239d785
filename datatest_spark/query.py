"""Squint-style query layer — the reference's §2D dataflow surface.

The reference's ``Select``/``Query``/``Result``
(datatest/__past__/squint/query.py:174-1563) stage data into SQLite
and hand-roll pushdown; here the DataFrame IS the staging layer and
Catalyst does the pushdown, so this module is a *thin* adapter that
preserves the reference's call shapes and its SQLite value semantics:

* ``Select(df)('A')``                     → column of values
* ``Select(df)(('A','B'))``               → tuples
* ``Select(df)({'A': 'B'})``              → group-by key → values
* ``**where``: scalar equality, set → IN, callable → vectorized UDF
  (query.py:1287-1364)
* aggregates with SQLite coercion (query.py:417-533): ``sum``/``avg``
  cast text→REAL with 0.0 fallback and skip NULLs (all-NULL → NULL);
  ``min``/``max`` order across storage classes NULL < numeric < text
* ``distinct`` / ``filter`` / ``map`` / ``reduce`` / ``apply`` /
  ``to_csv`` (query.py:519-798,1038-1073)

``fetch()``/``execute()`` return squint-shaped results: a list for
plain selections, a dict for group-by selections.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .predicates import compile_predicate

__all__ = ["Select", "Query"]


def _where_expr(df: DataFrame, conditions: Mapping[str, Any]) -> Optional[Column]:
    expr = None
    for col, cond in conditions.items():
        c = F.col(col)
        if isinstance(cond, (set, frozenset)):
            piece = c.isin(sorted(cond, key=repr))
        elif callable(cond):
            pred = compile_predicate(cond)
            piece = F.coalesce(pred.expr(c, None), F.lit(False))
        else:
            piece = c == F.lit(cond)
        expr = piece if expr is None else (expr & piece)
    return expr


def _sqlite_real(c: Column) -> Column:
    """SQLite numeric coercion: text that doesn't parse → 0.0, NULL
    stays NULL (query.py:417-428)."""
    return F.when(c.isNotNull(), F.coalesce(c.try_cast("double"), F.lit(0.0)))


def _class_rank(c: Column) -> Column:
    """SQLite storage-class order: numeric < text (NULLs skipped by
    aggregates) — query.py:457-482."""
    return F.when(c.try_cast("double").isNotNull(), F.lit(0)).otherwise(F.lit(1))


class Query:
    """Deferred query over a Select — each chained method appends to
    the DataFrame lineage (the logical IR the reference hand-builds as
    ``_query_step`` tuples, query.py:620-676)."""

    def __init__(self, df: DataFrame, value_cols: Sequence[str],
                 key_cols: Sequence[str], scalar: bool):
        self._df = df
        self._value_cols = list(value_cols)
        self._key_cols = list(key_cols)
        self._scalar = scalar  # single bare column selection

    # --- transforms ------------------------------------------------------

    def filter(self, predicate: Callable[[Any], Any] = None) -> "Query":
        col = F.col(self._value_cols[0])
        if predicate is None:
            pred_expr = col.cast("boolean")
        else:
            pred_expr = F.coalesce(
                compile_predicate(predicate).expr(col, None), F.lit(False)
            )
        return Query(self._df.filter(pred_expr), self._value_cols,
                     self._key_cols, self._scalar)

    def map(self, function: Callable[[Any], Any]) -> "Query":
        from pyspark.sql import types as T

        @F.pandas_udf(T.StringType())
        def apply_fn(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None else str(function(v)))

        out = self._df.withColumn(self._value_cols[0],
                                  apply_fn(F.col(self._value_cols[0])))
        return Query(out, self._value_cols, self._key_cols, self._scalar)

    def distinct(self) -> "Query":
        cols = self._key_cols + self._value_cols
        return Query(self._df.dropDuplicates(cols), self._value_cols,
                     self._key_cols, self._scalar)

    # --- SQLite-semantics aggregates --------------------------------------

    def _agg(self, agg_expr: Column) -> "Query":
        if self._key_cols:
            out = self._df.groupBy(*self._key_cols).agg(
                agg_expr.alias(self._value_cols[0])
            )
        else:
            out = self._df.agg(agg_expr.alias(self._value_cols[0]))
        return Query(out, [self._value_cols[0]], self._key_cols, True)

    def sum(self) -> "Query":
        c = F.col(self._value_cols[0])
        return self._agg(F.sum(_sqlite_real(c)))

    def avg(self) -> "Query":
        c = F.col(self._value_cols[0])
        return self._agg(F.avg(_sqlite_real(c)))

    def count(self) -> "Query":
        return self._agg(F.count(F.col(self._value_cols[0])))

    def _minmax(self, agg) -> "Query":
        from .schema import repr_col

        c = F.col(self._value_cols[0])
        ranked = agg(F.when(c.isNotNull(), F.struct(
            _class_rank(c).alias("r"),
            c.try_cast("double").alias("n"),
            c.cast("string").alias("s"),
        )))
        # numeric winners keep their original (repr-normalized) text form
        return self._agg(
            F.when(ranked["r"] == 0, repr_col(ranked["n"])).otherwise(ranked["s"])
        )

    def min(self) -> "Query":
        return self._minmax(F.min)

    def max(self) -> "Query":
        return self._minmax(F.max)

    # --- execution ---------------------------------------------------------

    def to_frame(self) -> DataFrame:
        return self._df

    def execute(self):
        return self.fetch()

    def fetch(self):
        """Collect into squint result shapes (query.py:1366-1412)."""
        rows = self._df.collect()
        if self._key_cols:
            out: dict = {}
            for r in rows:
                key = (
                    r[self._key_cols[0]]
                    if len(self._key_cols) == 1
                    else tuple(r[k] for k in self._key_cols)
                )
                val = (
                    r[self._value_cols[0]]
                    if len(self._value_cols) == 1
                    else tuple(r[v] for v in self._value_cols)
                )
                if self._scalar:
                    out[key] = val
                else:
                    out.setdefault(key, []).append(val)
            return out
        if self._scalar and len(rows) == 1 and len(self._value_cols) == 1:
            return rows[0][self._value_cols[0]]
        if len(self._value_cols) == 1:
            return [r[self._value_cols[0]] for r in rows]
        return [tuple(r[v] for v in self._value_cols) for r in rows]

    def reduce(self, function, initializer_factory=None):
        """Whole-result fold (query.py:743-762) — inherently sequential
        in the reference; runs driver-side over the fetched result."""
        from functools import reduce as _reduce

        values = self.fetch()
        if isinstance(values, dict):
            return {
                k: _reduce(function, v if isinstance(v, list) else [v],
                           *( [initializer_factory()] if initializer_factory else [] ))
                for k, v in values.items()
            }
        init = [initializer_factory()] if initializer_factory else []
        return _reduce(function, values, *init)

    def apply(self, function):
        """Whole-group function (query.py:327-338)."""
        values = self.fetch()
        if isinstance(values, dict):
            return {k: function(v) for k, v in values.items()}
        return function(values)

    def to_csv(self, path: str, header: bool = True) -> None:
        self._df.write.mode("overwrite").option("header", header).csv(path)


class Select:
    """squint.Select over a DataFrame (or parquet/csv path)."""

    def __init__(self, source: Union[DataFrame, str], spark=None, **read_opts):
        if isinstance(source, str):
            from .sources import read_csv, read_parquet

            if source.endswith(".parquet") or read_opts.pop("fmt", "") == "parquet":
                source = read_parquet(spark, source)
            else:
                source = read_csv(spark, source, **read_opts)
        self.df = source

    @property
    def fieldnames(self):
        return list(self.df.columns)

    def __call__(self, columns, **where) -> Query:
        df = self.df
        cond = _where_expr(df, where)
        if cond is not None:
            df = df.filter(cond)

        if isinstance(columns, Mapping):
            [(key_sel, value_sel)] = list(columns.items())
            key_cols = [key_sel] if isinstance(key_sel, str) else list(key_sel)
            value_cols = [value_sel] if isinstance(value_sel, str) else list(value_sel)
            return Query(df.select(*key_cols, *value_cols), value_cols,
                         key_cols, False)
        if isinstance(columns, str):
            return Query(df.select(columns), [columns], [], False)
        value_cols = list(columns)
        return Query(df.select(*value_cols), value_cols, [], False)
