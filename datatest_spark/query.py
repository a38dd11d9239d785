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
        self._unwrap = False  # set by unwrap(): fetch-shape modifier

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

    def _infer_return_type(self, samples):
        """Spark type for the mapped values, inferred from a small
        driver-side sample application (squint preserves Python value
        types — reference query.py:296-324 — so ``.map(x*2).sum()``
        must stay numeric, not string-coerced)."""
        from pyspark.sql import types as T

        vals = [v for v in samples if v is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            return T.BooleanType(), lambda v: v
        if vals and all(
            isinstance(v, int) and not isinstance(v, bool) for v in vals
        ):
            return T.LongType(), lambda v: v
        if vals and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in vals
        ):
            return T.DoubleType(), float
        return T.StringType(), str

    def map(self, function: Callable[[Any], Any], return_type=None) -> "Query":
        """Element-wise map (reference query.py:725-733,296-324).

        The return type is inferred by applying *function* to a small
        sample (one bounded collect) unless ``return_type`` is given —
        type fidelity over laziness, matching squint's behavior where
        mapped ints stay ints.

        Two hazards of the inference path (both avoided by passing
        ``return_type`` explicitly, which is recommended on any
        non-trivial upstream plan):

        * the sampling ``limit(20).collect()`` executes the upstream
          DAG — cheap for a scan+filter, but a join/agg upstream runs
          an extra (early-terminated) job per ``map`` call;
        * inference sees only the first 20 non-null values: if those
          are all ints but later rows map to floats, the LongType cast
          fails (ANSI) or truncates at full-table execution.  When the
          mapped type is mixed-numeric, pass
          ``return_type=DoubleType()``.
        """
        col_name = self._value_cols[0]
        coerce = None
        if return_type is None:
            sample = [
                r[col_name]
                for r in self._df.select(col_name)
                .filter(F.col(col_name).isNotNull())
                .limit(20)
                .collect()
            ]
            try:
                return_type, coerce = self._infer_return_type(
                    [function(v) for v in sample]
                )
            except Exception:
                from pyspark.sql import types as T

                return_type, coerce = T.StringType(), str

        def apply_fn(s: pd.Series) -> pd.Series:
            def one(v):
                if v is None:
                    return None
                out = function(v)
                if out is None or coerce is None:
                    return out
                return coerce(out)

            return s.map(one)

        udf = F.pandas_udf(apply_fn, return_type)
        out = self._df.withColumn(col_name, udf(F.col(col_name)))
        return Query(out, self._value_cols, self._key_cols, self._scalar)

    def starmap(self, function: Callable[..., Any], return_type=None) -> "Query":
        """Tuple-unpacking map over multi-column selections
        (reference query.py:725-733): ``function(*row)`` per element."""
        cols = [F.col(c) for c in self._value_cols]
        coerce = None
        if return_type is None:
            sample = (
                self._df.select(*self._value_cols)
                .limit(20)
                .collect()
            )
            try:
                return_type, coerce = self._infer_return_type(
                    [function(*tuple(r)) for r in sample]
                )
            except Exception:
                from pyspark.sql import types as T

                return_type, coerce = T.StringType(), str

        value_cols = list(self._value_cols)

        # a struct input arrives as one pd.DataFrame per Arrow batch
        # (pandas_udf rejects *args signatures)
        def apply_fn(batch: pd.DataFrame) -> pd.Series:
            out = []
            for vals in batch.itertuples(index=False):
                r = function(*vals)
                out.append(
                    r if (r is None or coerce is None) else coerce(r)
                )
            return pd.Series(out, dtype="object")

        udf = F.pandas_udf(apply_fn, return_type)
        out = self._df.select(
            *self._key_cols,
            udf(F.struct(*cols)).alias("_starmapped"),
        )
        return Query(out, ["_starmapped"], self._key_cols, self._scalar)

    def distinct(self) -> "Query":
        cols = self._key_cols + self._value_cols
        return Query(self._df.dropDuplicates(cols), self._value_cols,
                     self._key_cols, self._scalar)

    def flatten(self) -> "Query":
        """Flatten a grouped (dict-shaped) query into tuple rows —
        reference query.py:790-794,368-391: each ``key → value`` pair
        becomes a combined ``key + value`` tuple, one per element.  On
        a non-grouped query this is a no-op (reference parity).  The
        DataFrame already holds one row per element, so this only
        reshapes the fetch: the key columns join the value columns."""
        if not self._key_cols:
            return self
        return Query(self._df, self._key_cols + self._value_cols, [], False)

    def unwrap(self) -> "Query":
        """Unwrap single-item sequences (reference
        query.py:796-798,394-414): a 1-element list result becomes the
        bare element; in a grouped result each single-item group value
        is unwrapped.  A fetch-shape modifier — the plan is unchanged."""
        q = Query(self._df, self._value_cols, self._key_cols, self._scalar)
        q._unwrap = True
        return q

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
            if self._unwrap:
                out = {
                    k: (v[0] if isinstance(v, list) and len(v) == 1 else v)
                    for k, v in out.items()
                }
            return out
        if self._scalar and len(rows) == 1 and len(self._value_cols) == 1:
            return rows[0][self._value_cols[0]]
        if len(self._value_cols) == 1:
            result = [r[self._value_cols[0]] for r in rows]
        else:
            result = [tuple(r[v] for v in self._value_cols) for r in rows]
        if self._unwrap and len(result) == 1:
            return result[0]
        return result

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

    # --- legacy api07 BaseSource surface ----------------------------------
    # (reference __past__/api07_sources.py:79-129: column-level aggs
    # with keys= grouping and **where filtering.)  The scan, filter
    # pushdown and projection run in Spark; mapper/reducer application
    # follows the reference's sequential left-to-right contract on the
    # fetched values (same documented driver contract as Query.reduce)
    # — this is the deprecated compat layer, not the scale path.

    def mapreduce(self, mapper, reducer, columns, keys=None, **where):
        """Apply *mapper* to each value of *columns* (a tuple of values
        when *columns* is a sequence), group by *keys*, then fold each
        group with *reducer* left-to-right.  No *keys* → single result;
        with *keys* → dict (reference api07_sources.py:106-129)."""
        from functools import reduce as _reduce

        if keys is None:
            values = self(columns, **where).fetch()
            return _reduce(reducer, map(mapper, values))
        q = self({keys if isinstance(keys, str) else tuple(keys): columns},
                 **where)
        grouped = q.fetch()
        return {
            k: _reduce(reducer, map(mapper, v if isinstance(v, list) else [v]))
            for k, v in grouped.items()
        }

    def sum(self, column, keys=None, **where):
        """Legacy sum: empty/falsy values count as 0, exact decimal
        arithmetic (reference api07_sources.py:90-96)."""
        import decimal

        mapper = lambda x: decimal.Decimal(x) if x else decimal.Decimal(0)
        reducer = lambda x, y: x + y
        return self.mapreduce(mapper, reducer, column, keys, **where)

    def count(self, column, keys=None, **where):
        """Legacy count of truthy values (api07_sources.py:98-104)."""
        return self.mapreduce(
            lambda v: 1 if v else 0, lambda x, y: x + y, column, keys, **where
        )
