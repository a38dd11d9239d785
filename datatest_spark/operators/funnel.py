"""End-to-end curation funnel: validate → dedup → decontaminate → split.

Every stage is an operator this package already ships; the funnel is
the *composition* a training-data pipeline actually runs, with one
row of evidence per stage — ``(stage, rows_in, rows_out)`` — so the
attrition at each step is observable instead of implicit.

Stage semantics (each optional, in fixed order):

1. **valid** — keep rows passing ``valid_predicate`` (a Column
   expression: non-null text, language whitelist, …).  This is the
   ``validate()``/quarantine step reduced to its keep-side.
2. **dedup_exact** — keep the min-id row per exact text duplicate
   group, via the same 16-byte ``(xxhash64(text), length(text))``
   grouping as :func:`~datatest_spark.operators.dedup.exact_duplicates`
   (no document body ever enters the aggregate state; the join back
   is an equi-join on the hash pair + keep id).
3. **near_dedup** — optional caller-supplied frame transform
   (``DataFrame -> DataFrame``) slotted between exact dedup and
   decontamination: plug in the canonical-keep side of
   :func:`~datatest_spark.operators.graph.dedup_clusters`,
   :func:`~datatest_spark.operators.semantic.semantic_dedup`, or any
   custom pruner; the funnel reports its attrition like every other
   stage.  Must be a pure transformation (no actions) for
   ``emit="data"`` to stay lazy.
4. **decontaminate** — drop rows sharing ≥ ``min_overlap`` distinct
   word n-grams with ``eval_df``
   (:func:`~datatest_spark.operators.contamination.decontaminate`),
   as a broadcast/shuffle anti-join on contaminated ids.
5. **split** — keep the ``keep_split`` assignment of the
   deterministic md5 :func:`~datatest_spark.operators.split.hash_split`.

``emit="report"`` runs the funnel (each stage frame persisted, counted
once, then released) and returns the tiny stage-count frame;
``emit="data"`` returns the final clean DataFrame fully lazily — no
action, no persist, so it composes into a larger plan and the funnel
is a pure transformation at 100 TB.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["curation_funnel"]


def curation_funnel(df: DataFrame, eval_df: Optional[DataFrame] = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    valid_predicate: Optional[Column] = None,
                    n: int = 3, min_overlap: int = 1,
                    near_dedup: Optional[
                        Callable[[DataFrame], DataFrame]] = None,
                    fractions: Optional[Mapping[str, float]] = None,
                    keep_split: str = "train", salt: str = "",
                    emit: str = "report") -> DataFrame:
    """Run the curation funnel over ``df``; see module docstring."""
    if emit not in ("report", "data"):
        raise ValueError(f"curation_funnel: unknown emit={emit!r}")

    stages = []  # (name, frame_before, frame_after) built lazily
    cur = df

    if valid_predicate is not None:
        nxt = cur.filter(valid_predicate)
        stages.append(("valid", cur, nxt))
        cur = nxt

    # exact dedup: min-id per (xxhash64(text), length(text)) group —
    # the exact_duplicates aggregate shape, keep-side
    keys = (cur.groupBy(F.xxhash64(F.col(text_col)).alias("__h"),
                        F.length(text_col).alias("__l"))
            .agg(F.min(id_col).alias("__keep")))
    nxt = cur.join(
        keys,
        (F.xxhash64(F.col(text_col)) == F.col("__h"))
        & (F.length(text_col) == F.col("__l"))
        & (F.col(id_col) == F.col("__keep")),
        "left_semi")
    stages.append(("dedup_exact", cur, nxt))
    cur = nxt

    if near_dedup is not None:
        nxt = near_dedup(cur)
        stages.append(("near_dedup", cur, nxt))
        cur = nxt

    if eval_df is not None:
        from .contamination import decontaminate

        contaminated = (decontaminate(cur, eval_df, column=text_col,
                                      id_col=id_col, n=n,
                                      min_overlap=min_overlap)
                        .filter("contaminated").select(id_col))
        nxt = cur.join(contaminated, id_col, "left_anti")
        stages.append(("decontaminate", cur, nxt))
        cur = nxt

    if fractions is not None:
        from .split import hash_split

        nxt = (hash_split(cur, id_col, fractions, salt=salt)
               .filter(F.col("split") == keep_split).drop("split"))
        stages.append((f"split_{keep_split}", cur, nxt))
        cur = nxt

    if emit == "data":
        return cur

    spark = df.sparkSession
    # count each stage boundary exactly once: persist every stage
    # output (cache-manager plan matching makes the next stage's count
    # read it instead of recomputing the chain), count in order,
    # release after the report frame is materialized
    persisted = []
    rows = []
    prev_count = stages[0][1].count()  # the funnel's input size
    for name, _before, after in stages:
        persisted.append(after.persist())
        n_out = after.count()
        rows.append((name, int(prev_count), int(n_out)))
        prev_count = n_out
    out = spark.createDataFrame(
        rows, "stage string, rows_in long, rows_out long")
    for p in persisted:
        p.unpersist()
    return out
