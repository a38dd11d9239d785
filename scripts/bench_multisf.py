"""Multi-scale bench evidence for the heavy operators (minhash, ngram,
simhash, audio suite): run each at 1x and 5x input and report the
wall-time growth ratio.  Near-linear growth (ratio ≈ 5 per 5x rows)
evidences that the quadratic-candidate caps (LSH bucket caps, max_df
stop-shingles) are doing their job — the pair/self-join stages never
dominate.

The 5x corpus is the sf0.1 documents table replicated with every word
suffixed per replica ("_r<k>"): deterministic, JVM-side, and the
replicas are pairwise DISJOINT in shingle space, so the true near-dup
structure (and thus the output size) scales linearly with the input —
a 5x input must not mean 25x output, or the ratio would measure the
fixture, not the operator.

Usage: python scripts/bench_multisf.py  → one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = "/root/repo/.bench_cache"
AUDIO_1X = int(os.environ.get("SPARK_GRAFT_AUDIO_CLIPS", "100000"))
SCALE = 5


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("datatest_spark-bench-multisf")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def scaled_documents(spark, k: int):
    """k disjoint replicas of the documents table (word-suffixed)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n = base.count()
    reps = []
    for r in range(k):
        suffixed = F.array_join(
            F.transform(F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"_r{r}"))),
            " ",
        )
        reps.append(
            base.select(
                (F.col("doc_id") + r * n).alias("doc_id"),
                suffixed.alias("text"),
            )
        )
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out


def timed(fn, *args, **kw):
    t0 = time.time()
    df = fn(*args, **kw)
    n = df.count()
    return round(time.time() - t0, 2), n


def main():
    from datatest_spark.caching import unpersist_result  # noqa: F401
    from datatest_spark.operators import (
        minhash_neardup_pairs, ngram_jaccard_pairs, simhash_neardup_pairs,
    )
    from datatest_spark.operators.dedup import unpersist_cached

    os.makedirs(CACHE, exist_ok=True)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for label, k in (("1x", 1), ("5x", SCALE)):
        path = os.path.join(CACHE, f"docs_scaled_{k}x")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            scaled_documents(spark, k).repartition(CPUS).write.mode(
                "overwrite"
            ).parquet(path)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        row = {"docs": n_docs}
        row["minhash_sec"], row["minhash_pairs"] = timed(
            minhash_neardup_pairs, docs, "text", id_col="doc_id",
            num_hashes=32, bands=16, min_jaccard=0.5,
        )
        unpersist_cached(blocking=True)
        row["ngram_sec"], row["ngram_pairs"] = timed(
            ngram_jaccard_pairs, docs, "text", id_col="doc_id",
            n=3, min_jaccard=0.3, max_df=1000,
        )
        unpersist_cached(blocking=True)
        row["simhash_sec"], row["simhash_pairs"] = timed(
            simhash_neardup_pairs, docs, "text", id_col="doc_id",
            max_hamming=3,
        )
        unpersist_cached(blocking=True)
        results[label] = row

    # audio suite at 1x and 5x clips
    from datatest_spark.fixtures import audio_clips_df
    from datatest_spark.suite import validate_audio_table

    for label, n in (("1x", AUDIO_1X), ("5x", SCALE * AUDIO_1X)):
        path = os.path.join(CACHE, f"audio_v2_n{n}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            audio_clips_df(spark, n, parts=64 * (n // AUDIO_1X)).write.mode(
                "overwrite"
            ).parquet(path)
        df = spark.read.parquet(path)
        t0 = time.time()
        res = validate_audio_table(df, check_snr=True)
        res.violations.count()
        results[label]["audio_sec"] = round(time.time() - t0, 2)
        results[label]["audio_clips"] = n
        res.unpersist()
        spark.catalog.clearCache()

    ratios = {
        op: round(results["5x"][f"{op}_sec"] / results["1x"][f"{op}_sec"], 2)
        for op in ("minhash", "ngram", "simhash", "audio")
    }
    print(json.dumps({"results": results, "growth_ratio_5x": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
