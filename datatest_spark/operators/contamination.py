"""Benchmark decontamination: n-gram overlap of a training corpus
against a held-out evaluation set.

The standard LLM-training hygiene step (the GPT-3 appendix-C /
PaLM / Llama recipe): a training document is *contaminated* if it
shares at least ``min_overlap`` word n-grams with any document of the
evaluation/benchmark set; contaminated documents are dropped or
flagged before training.  This module gives the per-document evidence
row — overlap counts, not just a verdict — so the flag threshold can
be tuned after the expensive pass.

Scale shape (train = 10^12 docs, eval = 10^4..10^7 docs):

* Shingling is the same JVM-side ``transform``+``xxhash64`` path as
  :mod:`.dedup` — no Python in the hot loop; each side is reduced to
  **distinct 8-byte shingle hashes** before any join.
* The eval side is tiny relative to train: its distinct-hash set is
  **broadcast** when under ``broadcast_max`` hashes (one
  count() action decides), so the train side is a single scan +
  map-side semi-join — zero shuffle of train data.  Above the cap it
  degrades to a shuffle hash join on the 8-byte key, which is the
  floor.
* Per-document totals and overlaps are two partial-aggregated
  groupBys on ``(doc_id, hash)`` — the aggregate state is a count,
  never a shingle list.
* ``max_df`` (measured on the EVAL side) drops boilerplate shingles
  that occur in more than ``max_df`` eval documents — the classic
  guard against flagging every document that contains a common
  header; it also bounds the per-hash join fan-out.

Hashed comparison means a 64-bit collision can count one extra
overlap shingle; at 10^10 distinct shingles the expected number of
colliding *pairs* is < 3 — harmless for a flag with min_overlap >= 1
and never a false *negative*.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _word_shingles

__all__ = ["corpus_overlap", "decontaminate", "decontaminate_neardup",
           "eval_ngram_hashes"]


def eval_ngram_hashes(eval_df: DataFrame, column: str, n: int = 3,
                      id_col: Optional[str] = None,
                      max_df: Optional[int] = None) -> DataFrame:
    """Distinct xxhash64 word-``n``-gram hashes of the eval corpus —
    one column ``h``.  With ``max_df`` (requires ``id_col``), shingles
    occurring in more than ``max_df`` eval documents are dropped."""
    eval_df = eval_df.where(F.col(column).isNotNull())
    sh = F.explode(_word_shingles(F.col(column), n)).alias("s")
    if max_df is not None:
        if id_col is None:
            raise ValueError("max_df requires id_col (document counts)")
        per_doc = (
            eval_df.select(F.col(id_col).alias("__id"), sh)
            .select("__id", F.xxhash64("s", F.lit(42)).alias("h"))
            .distinct()
        )
        return (
            per_doc.groupBy("h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("h")
        )
    return (
        eval_df.select(sh)
        .select(F.xxhash64("s", F.lit(42)).alias("h"))
        .distinct()
    )


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  column: str = "text", id_col: str = "doc_id",
                  n: int = 3, min_overlap: int = 1,
                  max_df: Optional[int] = None,
                  broadcast_max: int = 5_000_000) -> DataFrame:
    """Per-train-document eval-set n-gram overlap.

    Returns one row per train document with non-null text (a null
    document has no n-grams to test; filter or impute upstream):
    ``(id_col, total_ngrams, overlap_ngrams, contamination,
    contaminated)`` where ``total_ngrams``/``overlap_ngrams`` count
    DISTINCT word n-grams (overall / shared with the eval set),
    ``contamination = overlap/total`` (total >= 1 always: a document
    shorter than ``n`` words contributes its whole text as one
    shingle) and ``contaminated = overlap_ngrams >= min_overlap``.

    ``eval_df`` may share documents with ``train`` — callers split
    first (:func:`datatest_spark.operators.split.hash_split` is the
    deterministic way).  See the module docstring for the 100 TB plan
    shape and the ``broadcast_max`` / ``max_df`` guards.
    """
    from ..caching import CacheHandle
    from .dedup import _HANDLES

    handle = CacheHandle(_HANDLES)
    # persist the eval hash set: the broadcast-decision count and the
    # overlap join both read it (without this the distinct runs twice)
    ev = handle.register(
        eval_ngram_hashes(eval_df, column, n=n, id_col=id_col,
                          max_df=max_df).persist())
    if ev.count() <= broadcast_max:  # tiny action on the small side
        ev = F.broadcast(ev)

    postings = (
        train.where(F.col(column).isNotNull())
        .select(
            F.col(id_col),
            F.explode(_word_shingles(F.col(column), n)).alias("s"),
        )
        .select(id_col, F.xxhash64("s", F.lit(42)).alias("h"))
        .distinct()
    )
    totals = postings.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("total_ngrams")
    )
    overlaps = (
        postings.join(ev, "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap_ngrams"))
    )
    return handle.attach(
        totals.join(overlaps, id_col, "left")
        .select(
            F.col(id_col),
            "total_ngrams",
            F.coalesce("overlap_ngrams", F.lit(0)).alias("overlap_ngrams"),
            (F.coalesce("overlap_ngrams", F.lit(0))
             / F.col("total_ngrams")).alias("contamination"),
            (F.coalesce("overlap_ngrams", F.lit(0)) >= min_overlap
             ).alias("contaminated"),
        )
    )


def corpus_overlap(df_a: DataFrame, df_b: DataFrame,
                   column: str = "text", n: int = 3) -> DataFrame:
    """Corpus-LEVEL n-gram overlap between two corpora — the one-row
    audit ("how much of snapshot B is already in snapshot A?") that
    decides whether a new crawl / vendor drop is worth deduplicating
    in, before any per-document work.

    Returns a single row: ``(ngrams_a, ngrams_b, ngrams_common,
    jaccard, containment_a, containment_b)`` over DISTINCT word
    n-grams — ``containment_a = common / ngrams_a`` is the fraction of
    corpus A's shingle vocabulary that corpus B also has.

    Scale shape: each side reduces to distinct 8-byte xxhash64 shingle
    keys (partial-aggregated), ONE full-outer join on the hash aligns
    the two sets, and one global aggregate of three conditional counts
    produces the row — the aggregate state is three longs, no shingle
    list ever materializes.  Same 64-bit collision bound as
    :func:`decontaminate` (module docstring): at 10^10 distinct
    shingles the expected error is < 3 counts.
    """
    def hashes(df, side):
        return (
            df.where(F.col(column).isNotNull())
            .select(F.explode(_word_shingles(F.col(column), n)).alias("s"))
            .select(F.xxhash64("s", F.lit(42)).alias("h"))
            .distinct()
            .withColumn(side, F.lit(1))
        )

    j = hashes(df_a, "_a").join(hashes(df_b, "_b"), "h", "full_outer")
    in_a = F.col("_a").isNotNull()
    in_b = F.col("_b").isNotNull()
    counts = j.agg(
        F.sum(in_a.cast("long")).alias("ngrams_a"),
        F.sum(in_b.cast("long")).alias("ngrams_b"),
        F.sum((in_a & in_b).cast("long")).alias("ngrams_common"),
    )
    common = F.col("ngrams_common")
    return counts.select(
        "ngrams_a", "ngrams_b", "ngrams_common",
        (common / (F.col("ngrams_a") + F.col("ngrams_b") - common)
         ).alias("jaccard"),
        (common / F.col("ngrams_a")).alias("containment_a"),
        (common / F.col("ngrams_b")).alias("containment_b"),
    )


def decontaminate_neardup(train: DataFrame, eval_df: DataFrame,
                          column: str = "text", id_col: str = "doc_id",
                          num_hashes: int = 32, bands: int = 16,
                          shingle_k: int = 3,
                          min_jaccard: float = 0.35,
                          max_bucket_size: Optional[int] = 10_000,
                          ) -> DataFrame:
    """FUZZY decontamination: training documents that NEAR-duplicate an
    eval document (paraphrases, truncations, light edits — the leakage
    exact n-gram overlap under-weights and the Dolma/Llama recipes
    chase with fuzzy matching).  Cross-corpus MinHash LSH: both sides
    share the hash families, candidates come from banded-bucket
    equality ACROSS the corpora, then a verification join computes the
    TRUE shingle Jaccard — the output is evidence, not an estimate.

    Returns ``(train_id, eval_id, jaccard)`` with ``jaccard >=
    min_jaccard``.

    Scale shape (train = 10^12 docs, eval small): the eval side's
    banded frame and shingle sets are **broadcast** (eval/benchmark
    sets are small by construction — for a large eval side fall back
    to :func:`datatest_spark.operators.dedup.minhash_neardup_pairs` on
    the union), so the train side is one signature scan plus a
    map-side join — zero train shuffle before the candidate distinct.
    ``max_bucket_size`` drops degenerate train buckets (boilerplate)
    before pairing, the same skew guard as the self-join path.
    Recall is the standard banded-LSH curve; candidacy is
    deterministic given the seeded families, and the oracle emulates
    it exactly.
    """
    from ..caching import CacheHandle
    from .dedup import (_HANDLES, _banded, _drop_oversized_buckets,
                        _word_shingles, minhash_signatures)

    handle = CacheHandle(_HANDLES)
    rows_per_band = num_hashes // bands
    tr = train.where(F.col(column).isNotNull())
    ev = eval_df.where(F.col(column).isNotNull())

    tb = _banded(
        minhash_signatures(tr, column, id_col, num_hashes, shingle_k),
        id_col, bands, rows_per_band,
    ).drop("minhash")
    tb = handle.register(tb.persist())
    tb = _drop_oversized_buckets(tb, max_bucket_size)
    eb = _banded(
        minhash_signatures(ev, column, id_col, num_hashes, shingle_k),
        id_col, bands, rows_per_band,
    ).drop("minhash")

    cand = (
        tb.select("band", "bucket", F.col(id_col).alias("train_id"))
        .join(F.broadcast(
            eb.select("band", "bucket", F.col(id_col).alias("eval_id"))),
            ["band", "bucket"])
        .select("train_id", "eval_id")
        .distinct()
    )
    sh = F.array_distinct(_word_shingles(F.col(column), shingle_k))
    sh_t = tr.select(F.col(id_col).alias("train_id"), sh.alias("_sa"))
    sh_e = ev.select(F.col(id_col).alias("eval_id"), sh.alias("_sb"))
    jac = F.round(
        F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
        / F.size(F.array_union(F.col("_sa"), F.col("_sb"))),
        4,
    )
    out = (
        cand.join(sh_t, "train_id")
        .join(F.broadcast(sh_e), "eval_id")
        .select("train_id", "eval_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return handle.attach(out)
