"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding LSH.

Scale shapes:

* **exact**: one hash-groupBy (map-side partial agg) — the cheapest
  possible full-table dedup; group key is ``xxhash64(column)`` so the
  shuffle carries 8-byte keys, not document bodies.
* **MinHash+LSH**: shingle → per-seed min-hash (JVM-side
  ``transform``+``xxhash64`` — no UDF) → band buckets → self-join per
  bucket.  The self-join is on (band, bucket-hash): only candidate
  pairs shuffle, never the full cross product.
* **SimHash**: 64-bit bit-vote signature via one vectorized pandas UDF
  (numpy bit ops per Arrow batch), then Hamming-band bucketing.
* **embedding near-dup**: random-hyperplane LSH buckets JVM-side, exact
  cosine only within buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "exact_duplicates",
    "minhash_signatures",
    "minhash_neardup_pairs",
    "simhash_signatures",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
]


def exact_duplicates(df: DataFrame, column: str, id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by exact content equality."""
    return (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def _word_shingles(col: Column, k: int) -> Column:
    toks = F.split(col, " ")
    n = F.greatest(F.size(toks) - k + 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )


def minhash_signatures(df: DataFrame, column: str, id_col: str = "doc_id",
                       num_hashes: int = 32, shingle_k: int = 3) -> DataFrame:
    """MinHash signature per document: k-word shingles hashed with
    ``num_hashes`` seeded xxhash64 functions, min per seed.  Entirely
    JVM-side (transform + array_min) — one projection, no shuffle."""
    shingles = _word_shingles(F.col(column), shingle_k)
    sig = F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, seed=seed: F.xxhash64(s, F.lit(seed)))
            )
            for seed in range(num_hashes)
        ]
    )
    return df.select(F.col(id_col), sig.alias("minhash"))


def minhash_neardup_pairs(df: DataFrame, column: str, id_col: str = "doc_id",
                          num_hashes: int = 32, bands: int = 8,
                          shingle_k: int = 3,
                          min_jaccard: Optional[float] = 0.5) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join, then verify
    estimated Jaccard (fraction of agreeing minhash components).

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, column, id_col, num_hashes, shingle_k)

    banded = sigs.select(
        F.col(id_col),
        F.col("minhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("minhash")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "minhash", "bb.band", "bb.bucket")

    a = banded.select(
        F.col("band"), F.col("bucket"),
        F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a"),
    )
    b = banded.select(
        F.col("band"), F.col("bucket"),
        F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b"),
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(float(num_hashes))
    )
    out = pairs.select(
        "id_a", "id_b", F.round(est, 4).alias("est_jaccard")
    )
    if min_jaccard is not None:
        out = out.filter(F.col("est_jaccard") >= min_jaccard)
    return out


SIMHASH_SCHEMA = T.LongType()


def simhash_signatures(df: DataFrame, column: str, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (vectorized numpy bit-vote per Arrow
    batch — the only Python stage in the dedup family)."""

    @F.pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            hashes = np.array(
                [hash(w) & 0xFFFFFFFFFFFFFFFF for w in t.split(" ")],
                dtype=np.uint64,
            )
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            votes = bits.sum(axis=0) * 2 - len(hashes)
            sig = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), simhash(F.col(column)).alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, column: str, id_col: str = "doc_id",
                          max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: 4-band Hamming LSH (any 16-bit band
    equal → candidate), then exact Hamming distance filter JVM-side."""
    sigs = simhash_signatures(df, column, id_col).cache()
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bucket")

    a = banded.select("band", "bucket", F.col(id_col).alias("id_a"),
                      F.col("simhash").alias("sig_a"))
    b = banded.select("band", "bucket", F.col(id_col).alias("id_b"),
                      F.col("simhash").alias("sig_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def embedding_neardup_pairs(df: DataFrame, column: str = "embedding",
                            id_col: str = "vec_id", planes: int = 16,
                            min_cosine: float = 0.9,
                            seed: int = 42) -> DataFrame:
    """Embedding near-duplicates: random-hyperplane LSH bucket (sign
    bits of ``planes`` seeded projections) then exact cosine within
    buckets.  Hyperplanes are deterministic from ``seed``."""
    dim_row = df.select(F.size(F.col(column)).alias("d")).first()
    dim = dim_row["d"]
    rng = np.random.RandomState(seed)
    hyper = rng.randn(planes, dim)

    proj_bits = []
    for p in range(planes):
        coeffs = F.array(*[F.lit(float(x)) for x in hyper[p]])
        dot = F.aggregate(
            F.zip_with(F.col(column).cast("array<double>"), coeffs,
                       lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_bits.append((dot > 0).cast("long") * F.lit(2 ** p))
    bucket = sum(proj_bits[1:], proj_bits[0])

    withb = df.select(F.col(id_col), F.col(column), bucket.alias("bucket"))
    a = withb.select("bucket", F.col(id_col).alias("id_a"),
                     F.col(column).alias("va"))
    b = withb.select("bucket", F.col(id_col).alias("id_b"),
                     F.col(column).alias("vb"))
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x.cast("array<double>"), y.cast("array<double>"),
                       lambda p_, q_: p_ * q_),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va")))
        * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    return pairs.select(
        "id_a", "id_b", F.round(cos, 4).alias("cosine")
    ).filter(F.col("cosine") >= min_cosine)
