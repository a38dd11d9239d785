"""Bucketed-table helpers: shuffle-free referential joins at scale.

The engine's heaviest recurring join is "data table vs manifest on
clip_id" (ref_match / ref_approx / subset-of-manifest — reference
analogue: datatest's mapping/reference requirements, requirements.py:
801-874, evaluated as joins here).  At 10^12 rows that join's two
shuffles dominate the plan.  Spark's remedy is **bucketing**: write
both tables bucketed (and sort-bucketed) by the join key — then a
sort-merge join reads co-located buckets directly and the `Exchange`
(and usually the `Sort`) disappears from the physical plan entirely.

``write_bucketed`` is deliberately thin — the point is the documented,
plan-tested recipe:

    write_bucketed(audio_df,    "audio_b",    ["clip_id"], 64)
    write_bucketed(manifest_df, "manifest_b", ["clip_id"], 64)
    joined = spark.table("audio_b").join(spark.table("manifest_b"),
                                         "clip_id")
    # physical plan: SortMergeJoin WITHOUT Exchange on either side

Bucket counts must MATCH on both sides (or be integer multiples with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).  Pick the
count once for the lake (e.g. 4096 at 10^12 rows) — re-bucketing is a
full rewrite, so it is a table-design decision, not a per-query one.

Iceberg note: the same effect comes from ``bucket(N, clip_id)``
partition transforms + storage-partitioned joins; this module uses the
built-in catalog's bucketed tables, which is what this sandbox can
execute and plan-test.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "assert_no_shuffle_join"]


def write_bucketed(df: DataFrame, table: str, cols: Sequence[str],
                   buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist *df* as a bucketed (+sorted) table on *cols*.

    Sorting within buckets additionally removes the per-task ``Sort``
    from later sort-merge joins on the same key.
    """
    writer = df.write.mode(mode).bucketBy(buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def assert_no_shuffle_join(joined: DataFrame) -> str:
    """Raise if the join plan contains an Exchange (diagnostic used by
    tests and deployment smoke checks); returns the plan string."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed join still shuffles — bucket counts/keys likely "
            "mismatch:\n" + plan
        )
    return plan
