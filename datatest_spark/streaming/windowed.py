"""Watermarked windowed aggregation — late-data-safe streaming
profiles.

The batch engine's column profiles (stats.py) assume a complete table;
a streaming ingest needs per-time-window profiles that tolerate
late/out-of-order events without unbounded state.  This is exactly
Spark's watermark + window aggregation: state is bounded to windows
newer than ``max(event_time) - allowed_lateness``, and a window's row
is emitted once, when the watermark passes its end — so the output
stream is append-only and idempotent to re-run from checkpoint.

Determinism note (what the oracle certifies): with an
``availableNow`` replay over a fixed input, the emitted set is exactly
the windows whose end <= global ``max(event_time) - allowed_lateness``
— independent of micro-batch arrival order (the watermark is a
monotonic max over everything seen).  Windows newer than that remain
in state, awaiting more data — the streaming-correct behavior, not a
bug.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_profile", "windowed_drift_psi"]


def windowed_profile(stream_df: DataFrame, ts_col: str,
                     value_col: Optional[str] = None,
                     window: str = "1 hour",
                     allowed_lateness: str = "97 minutes",
                     keys: Sequence[str] = (),
                     bin_edges: Optional[Sequence[float]] = None,
                     tdigest_grid: Optional[int] = None,
                     tdigest_accuracy: int = 10_000) -> DataFrame:
    """Per-window (x keys) profile of a stream: row count, plus
    sum/min/max of ``value_col`` when given — and, with ``bin_edges``,
    a fixed-edge histogram ``hist`` of the value column per window
    (bucket i = #values with exactly i edges below them).  Histogram
    counts are plain conditional sums, so they stream under the
    watermark with the same bounded state as the other aggregates, and
    they are the exact shape :func:`windowed_drift_psi` and the batch
    drift rules (stats.py :meth:`DriftPSIRule.from_histogram`)
    consume — the streaming feed for incremental drift baselines.

    With ``tdigest_grid``, each window also carries an adaptive
    t-digest of the value column (same representation as the batch
    :func:`~datatest_spark.stats.partitioned_profile`): an equal-mass
    centroid grid from the streaming-capable Greenwald-Khanna
    aggregate (``percentile_approx`` merges per-batch state under the
    watermark like any other aggregate).  Unlike ``bin_edges`` this
    needs no edges chosen before the stream starts; emitted windows
    fold into one baseline with
    :func:`~datatest_spark.stats.merge_tdigest_column` and feed
    :meth:`~datatest_spark.stats.DriftPSIRule.from_tdigest`.

    ``allowed_lateness`` is the watermark delay: events later than
    this past the stream's max event time are dropped, and a window
    finalizes (emits) once the watermark passes its end.  The default
    is deliberately NOT a multiple of the window size, so the cutoff
    never lands exactly on a window boundary (which would make the
    emit-on-equality edge observable).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    extra_cols = []
    if value_col is not None:
        c = F.col(value_col)
        aggs += [
            F.round(F.sum(c), 4).alias("value_sum"),
            F.min(c).alias("value_min"),
            F.max(c).alias("value_max"),
        ]
        extra_cols += ["value_sum", "value_min", "value_max"]
        if tdigest_grid:
            midgrid = [(i + 0.5) / tdigest_grid for i in range(tdigest_grid)]
            aggs += [
                F.percentile_approx(
                    c.cast("double"), midgrid, tdigest_accuracy
                ).alias("__tdm"),
                F.count(c).alias("__nnv"),
            ]
        if bin_edges:
            edges = sorted({float(e) for e in bin_edges})
            cd = c.cast("double")
            idx: Column = F.lit(0)
            for e in edges:
                idx = idx + (cd > F.lit(e)).cast("int")
            aggs += [
                F.sum((cd.isNotNull() & (idx == F.lit(i))).cast("long"))
                .alias(f"__h{i}")
                for i in range(len(edges) + 1)
            ]
    w = F.window(ts_col, window).alias("_w")
    out = (
        stream_df.withWatermark(ts_col, allowed_lateness)
        .groupBy(w, *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    hist_cols = []
    if value_col is not None and bin_edges:
        n_buckets = len(sorted({float(e) for e in bin_edges})) + 1
        hist_cols = [
            F.array(*[F.col(f"__h{i}") for i in range(n_buckets)])
            .alias("hist")
        ]
    td_cols = []
    if value_col is not None and tdigest_grid:
        from ..stats import TDIGEST_SCHEMA

        w_each = F.col("__nnv").cast("double") / F.lit(float(tdigest_grid))

        def _mk_centroid(weight_col):
            # arity-1 factory: F.transform treats 2-param callables
            # as (element, index)
            def _centroid(x):
                return F.struct(x.alias("mean"), weight_col.alias("weight"))

            return _centroid

        td_cols = [
            F.when(
                F.col("__tdm").isNotNull() & (F.col("__nnv") > 0),
                F.transform(F.col("__tdm"), _mk_centroid(w_each)),
            ).cast(TDIGEST_SCHEMA).alias("tdigest")
        ]
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *[F.col(k) for k in keys],
        *[F.col(a) for a in (["n_rows"] + extra_cols)],
        *hist_cols,
        *td_cols,
    )


def windowed_drift_psi(profiles: DataFrame,
                       baseline_props: Sequence[float],
                       threshold: float = 0.2,
                       eps: float = 1e-6) -> DataFrame:
    """Per-window PSI against a fixed baseline, columnar over the
    ``hist`` arrays :func:`windowed_profile` emits — closing the loop
    between the streaming layer and the drift rules: a baseline from
    :func:`datatest_spark.stats.merge_profiles` (same fixed edges)
    scores every emitted window with NO rescan and NO Python row path.

    Works on the streaming frame itself (it is a pure projection) or on
    a batch read-back of the profile sink.  Adds ``psi`` (rounded to 6
    decimals) and ``drifted`` columns.
    """
    total = float(sum(baseline_props)) or 1.0
    q_arr = [max(float(p) / total, eps) for p in baseline_props]
    n = F.aggregate(
        F.col("hist"), F.lit(0.0), lambda a, b: a + b.cast("double")
    )
    props = F.transform(
        F.col("hist"),
        lambda c: F.greatest(c.cast("double") / n, F.lit(eps)),
    )
    terms = F.zip_with(
        props,
        F.array(*[F.lit(q) for q in q_arr]),
        lambda p, q: (p - q) * F.log(p / q),
    )
    psi = F.round(
        F.aggregate(terms, F.lit(0.0), lambda a, b: a + b), 6
    )
    return profiles.withColumn("psi", psi).withColumn(
        "drifted", F.col("psi") > F.lit(float(threshold))
    )
