"""Skew handling: salted repartitioning + AQE knobs (north_rule).

The north rule calls for skewed ``clip_id``/``codec`` partitions to be
handled by **salted repartitioning** and **AQE skew-join hints**.  Two
distinct mechanisms, two distinct failure modes:

* **Joins** (referential checks, LSH candidate self-joins): Spark's
  Adaptive Query Execution splits oversized shuffle partitions at
  runtime — :func:`enable_adaptive` turns the right knobs on and is a
  no-op re-applying them.  Nothing else to do per-query: AQE sees the
  real shuffle sizes, which is strictly better than guessing salt
  factors ahead of time.
* **Stage imbalance on a hot key** (one codec holding 90% of the
  corpus; a single Iceberg data partition dwarfing the rest): AQE
  cannot split what is not a join — a ``repartition(col)`` or grouped
  ``applyInPandas`` on the hot column lands the whole key on one task.
  :func:`salted_repartition` spreads each key over ``buckets``
  sub-tasks with a *deterministic* salt (a hash of a stable id column
  — NOT ``rand()``, which changes on task retry and breaks exactly-once
  sinks).

Salting an *aggregation* is deliberately absent: hash aggregates
already do map-side partial aggregation, so per-key state is bounded
by distinct keys per task, not rows — salting there only adds a
shuffle.  (Reference has no distributed analogue; this module exists
for the north rule's cluster-scale contract.)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["enable_adaptive", "salted_repartition", "key_skew_stats"]

#: AQE configuration applied by :func:`enable_adaptive`.
_AQE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # split a shuffle partition when it exceeds 5x the median AND the
    # advisory size — the defaults, stated explicitly so deployments
    # can see (and tune) the policy in one place
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64MB",
}


def enable_adaptive(spark: SparkSession) -> SparkSession:
    """Enable AQE + skew-join splitting on the session (idempotent).

    Runtime confs only — safe to call on a live session; applies to
    queries compiled afterwards.
    """
    for k, v in _AQE_CONFS.items():
        spark.conf.set(k, v)
    return spark


def salted_repartition(df: DataFrame, cols: Sequence[str], buckets: int = 8,
                       id_col: Optional[str] = None,
                       num_partitions: Optional[int] = None) -> DataFrame:
    """Repartition by ``(cols…, salt)`` so a hot key spreads over up to
    ``buckets`` tasks instead of one.

    The salt is ``pmod(xxhash64(id_col), buckets)`` when a stable id
    column is given (deterministic across retries/restarts — required
    upstream of idempotent sinks), else a hash of ALL columns (equal
    rows co-locate, still deterministic).  The salt column does not
    survive: downstream sees the original schema and co-partitioning
    by key is intentionally given up — use this ONLY above stages that
    do not require key co-location (row rules, per-batch decode,
    writes), never directly under a key join or grouped aggregate.

    ``num_partitions`` pins the shuffle's partition count, which also
    opts it out of AQE partition coalescing — leave it unset at scale
    (AQE right-sizes the output), set it when a small-but-skewed frame
    must actually land on multiple tasks despite its byte size.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    src = F.col(id_col) if id_col is not None else F.struct(*df.columns)
    salt = F.pmod(F.xxhash64(src), F.lit(buckets))
    tmp = "_dts_salt"
    parts = [F.col(c) for c in cols] + [F.col(tmp)]
    salted = df.withColumn(tmp, salt)
    if num_partitions is not None:
        salted = salted.repartition(num_partitions, *parts)
    else:
        salted = salted.repartition(*parts)
    return salted.drop(tmp)


def key_skew_stats(df: DataFrame, cols: Sequence[str], k: int = 20) -> DataFrame:
    """Diagnostic: the ``k`` heaviest key groups with their share of
    the total — run it at a sampled fraction when sizing salt buckets.
    One aggregate (map-side combined) + a tiny top-k sort.
    """
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt") / F.col("_total"), 4))
        .drop("_total")
        .orderBy(F.col("cnt").desc())
        .limit(k)
    )
