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


def read_steal():
    """(steal_ticks, total_ticks) from the aggregate /proc/stat line —
    hypervisor steal measurement, same gate as bench.py."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    v = [int(x) for x in parts[1:]]
    return v[7], sum(v)


STEAL_GATE = 0.01  # this box collapses multi-x well below bench.py's 3%


def timed(fn, *args, runs=3, **kw):
    """Best-of-N STEAL-CLEAN wall seconds (host noise is one-sided
    scheduling spikes + hypervisor steal; a run timed during a steal
    phase measures the co-tenant, not the plan).  Steal-spiked runs
    retry up to 2x the budget; if no clean run lands, the best
    contaminated wall is still reported (upper bound)."""
    best, best_any, n, clean = None, None, None, 0
    for _ in range(2 * runs):
        s0, t0t = read_steal()
        t0 = time.time()
        df = fn(*args, **kw)
        n = df.count()
        el = time.time() - t0
        s1, t1t = read_steal()
        steal = (s1 - s0) / max(t1t - t0t, 1)
        best_any = el if best_any is None else min(best_any, el)
        if steal <= STEAL_GATE:
            clean += 1
            best = el if best is None else min(best, el)
        from datatest_spark.operators.dedup import unpersist_cached

        unpersist_cached(blocking=True)
        # nudge the driver JVM GC so ContextCleaner releases the
        # finished runs' shuffle files: a long single-session harness
        # otherwise accumulates tens of GB of dead shuffle output in
        # the block manager dir and can fill the disk mid-run
        try:
            df.sparkSession._jvm.System.gc()
        except Exception:
            pass
        if clean >= runs:
            break
    return round(best if best is not None else best_any, 2), n


def main():
    from datatest_spark.caching import unpersist_result  # noqa: F401
    from datatest_spark.operators import (
        minhash_neardup_pairs, ngram_jaccard_pairs, simhash_neardup_pairs,
    )
    from datatest_spark.operators.dedup import unpersist_cached

    os.makedirs(CACHE, exist_ok=True)
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    frames = {}
    for label, k in (("1x", 1), ("5x", SCALE)):
        path = os.path.join(CACHE, f"docs_scaled_{k}x")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            scaled_documents(spark, k).repartition(CPUS).write.mode(
                "overwrite"
            ).parquet(path)
        frames[label] = spark.read.parquet(path)

    results = {label: {"docs": df.count()} for label, df in frames.items()}
    ops = {
        "minhash": (minhash_neardup_pairs,
                    dict(num_hashes=32, bands=16, min_jaccard=0.5)),
        "ngram": (ngram_jaccard_pairs,
                  dict(n=3, min_jaccard=0.3, max_df=1000)),
        "simhash": (simhash_neardup_pairs, dict(max_hamming=3)),
    }
    # per-op: untimed warm-up (python workers / codegen), then the
    # timed 1x and 5x points back-to-back so both scales of one op
    # sample the same host phase
    for op, (fn, kw) in ops.items():
        fn(frames["1x"], "text", id_col="doc_id", **kw).count()
        unpersist_cached(blocking=True)
        for label in ("1x", "5x"):
            sec, pairs = timed(fn, frames[label], "text",
                               id_col="doc_id", **kw)
            results[label][f"{op}_sec"] = sec
            results[label][f"{op}_pairs"] = pairs

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
        best, best_any, clean = None, None, 0
        for _ in range(4):  # same steal gate as timed(): 2x retry budget
            s0, t0t = read_steal()
            t0 = time.time()
            res = validate_audio_table(df, check_snr=True)
            res.violations.count()
            el = time.time() - t0
            s1, t1t = read_steal()
            res.unpersist()
            spark.catalog.clearCache()
            spark._jvm.System.gc()  # release finished shuffle files
            steal = (s1 - s0) / max(t1t - t0t, 1)
            best_any = el if best_any is None else min(best_any, el)
            if steal <= STEAL_GATE:
                clean += 1
                best = el if best is None else min(best, el)
            if clean >= 2:
                break
        results[label]["audio_sec"] = round(
            best if best is not None else best_any, 2)
        results[label]["audio_clips"] = n

    # round-5 audio curation operators on the same cached clip tables.
    # audio_dedup_groups is the linear-OUTPUT content-dedup path (one
    # row per signature group); the pairwise LSH variant is excluded
    # here because the fixture's 400-tone content space makes true
    # near-dup pair counts quadratic in input — the ratio would
    # measure the fixture, not the operator (see module docstring).
    from datatest_spark.audio import audio_dedup_groups, audio_features

    audio_features(
        spark.read.parquet(os.path.join(CACHE, f"audio_v2_n{AUDIO_1X}"))
    ).count()  # warm-up
    for label, n in (("1x", AUDIO_1X), ("5x", SCALE * AUDIO_1X)):
        df = spark.read.parquet(os.path.join(CACHE, f"audio_v2_n{n}"))
        sec, rows = timed(audio_features, df, runs=2)
        results[label]["afeat_sec"] = sec
        sec, groups = timed(audio_dedup_groups, df, runs=2)
        results[label]["adedup_sec"] = sec
        results[label]["adedup_groups"] = groups

    # round-5 curation operators over the same scaled documents: the
    # disjoint replicas replicate the pair graph per replica, so true
    # cluster/overlap structure grows linearly with input by
    # construction (same argument as the pairwise ops above)
    from pyspark.sql import functions as F

    from datatest_spark.operators import (
        decontaminate, dedup_clusters, ngram_jaccard_pairs,
    )

    def _clusters(df):
        pairs = ngram_jaccard_pairs(
            df, "text", id_col="doc_id", n=2, min_jaccard=0.1, max_df=1000)
        return dedup_clusters(df, pairs)

    def _decontam(df):
        ev = df.where(F.col("doc_id") % 17 == 0)
        return decontaminate(df.where(F.col("doc_id") % 17 != 0), ev, n=3)

    for op, fn in (("clusters", _clusters), ("decontam", _decontam)):
        fn(frames["1x"]).count()  # warm-up
        unpersist_cached(blocking=True)
        for label in ("1x", "5x"):
            sec, rows = timed(fn, frames[label], runs=2)
            results[label][f"{op}_sec"] = sec
            results[label][f"{op}_rows"] = rows

    # end-of-round-5 additions: combined one-pass analysis and the
    # transcript label-conflict groups on the cached clip tables
    # (both linear-output), fuzzy cross-corpus decontamination and
    # quality-scored canonical selection on the scaled documents
    from datatest_spark.audio import audio_analysis, \
        audio_transcript_conflicts
    from datatest_spark.operators import (decontaminate_neardup,
                                          unigram_logprob)

    audio_analysis(
        spark.read.parquet(os.path.join(CACHE, f"audio_v2_n{AUDIO_1X}"))
    ).count()  # warm-up
    for label, n in (("1x", AUDIO_1X), ("5x", SCALE * AUDIO_1X)):
        df = spark.read.parquet(os.path.join(CACHE, f"audio_v2_n{n}"))
        sec, rows = timed(audio_analysis, df, runs=2)
        results[label]["analysis_sec"] = sec
        sec, rows = timed(audio_transcript_conflicts, df, runs=2)
        results[label]["labelconf_sec"] = sec
        results[label]["labelconf_groups"] = rows

    def _fuzzy_decon(df):
        ev = df.where(F.col("doc_id") % 17 == 0)
        return decontaminate_neardup(
            df.where(F.col("doc_id") % 17 != 0), ev, min_jaccard=0.3)

    def _canonical(df):
        pairs = ngram_jaccard_pairs(
            df, "text", id_col="doc_id", n=2, min_jaccard=0.1, max_df=1000)
        scores = unigram_logprob(df, "text", vocab_size=500)
        return dedup_clusters(df, pairs, scores=scores,
                              score_col="logprob_r")

    for op, fn in (("fuzzydecon", _fuzzy_decon), ("canonical", _canonical)):
        fn(frames["1x"]).count()  # warm-up
        unpersist_cached(blocking=True)
        for label in ("1x", "5x"):
            sec, rows = timed(fn, frames[label], runs=2)
            results[label][f"{op}_sec"] = sec
            results[label][f"{op}_rows"] = rows

    # round-5 semantic dedup over the clips' spectral embeddings
    # (embeddings cached once per scale so the ratio isolates the
    # SemDeDup stages, not the decode).  The cluster count scales with
    # the corpus (k = n/1562 → expected cluster size ~1.5k constant) —
    # the SemDeDup deployment discipline: the within-cluster pairwise
    # stage is O(n * cluster_size * d), so a FIXED k would make it
    # quadratic in n (measured: wall ratio 13.6 on 5x input at k=64);
    # constant cluster size keeps it linear, and assignment stays
    # cheap (n * k * d with k << n).
    from datatest_spark.audio import spectral_embeddings
    from datatest_spark.operators import semantic_dedup

    for label, n in (("1x", AUDIO_1X), ("5x", SCALE * AUDIO_1X)):
        path = os.path.join(CACHE, f"emb_n{n}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            clips = spark.read.parquet(
                os.path.join(CACHE, f"audio_v2_n{n}"))
            (spectral_embeddings(clips).filter(F.col("ok"))
             .dropDuplicates(["clip_id"])
             .write.mode("overwrite").parquet(path))
        emb = spark.read.parquet(path)
        k = max(64, n // 1562)

        def _semantic(df, _k=k):
            return semantic_dedup(df, "embedding", id_col="clip_id",
                                  n_clusters=_k, threshold=0.9995,
                                  max_cluster_size=200_000)

        if label == "1x":
            _semantic(emb).count()  # warm-up
        sec, rows = timed(_semantic, emb, runs=2)
        results[label]["semantic_sec"] = sec
        results[label]["semantic_rows"] = rows

    # round-5 shard exporter on the cached clip tables: tar assembly
    # is linear in bytes by construction (bounded shards, one decode-
    # free pass); at a fixed target size the shard COUNT scales with
    # input while per-task memory stays one shard
    from datatest_spark.operators.shards import shard_tars
    from datatest_spark.operators.shards import (
        unpersist_cached as _shards_unpersist,
    )

    def _shards(df):
        return shard_tars(df, 16 * 1024 * 1024)

    _shards(
        spark.read.parquet(os.path.join(CACHE, f"audio_v2_n{AUDIO_1X}"))
    ).count()  # warm-up
    _shards_unpersist(True)
    for label, n in (("1x", AUDIO_1X), ("5x", SCALE * AUDIO_1X)):
        df = spark.read.parquet(os.path.join(CACHE, f"audio_v2_n{n}"))
        sec, rows = timed(_shards, df, runs=2)
        _shards_unpersist(True)
        results[label]["shards_sec"] = sec
        results[label]["shards_count"] = rows

    # round-5 VAD over speech-shaped clips (decode + frame energies:
    # linear by construction, measured anyway) and corpus-fit BPE
    # (one word-count shuffle + driver fit over the Zipf-bounded
    # vocabulary + broadcast encode)
    from datatest_spark.audio import vad_stats
    from datatest_spark.fixtures import speech_clips_df
    from datatest_spark.operators.bpe import bpe_encode, bpe_train

    vad_1x = AUDIO_1X // 5  # speech clips are ~2s (10x the F1 mean); keep the 5x table generable in minutes
    for label, n in (("1x", vad_1x), ("5x", SCALE * vad_1x)):
        path = os.path.join(CACHE, f"speech_n{n}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            speech_clips_df(spark, n, parts=CPUS * 2).write.mode(
                "overwrite").parquet(path)
        df = spark.read.parquet(path)
        if label == "1x":
            vad_stats(df).count()  # warm-up
        sec, rows = timed(vad_stats, df, runs=2)
        results[label]["vad_sec"] = sec
        results[label]["vad_rows"] = rows

    def _bpe(df):
        merges = bpe_train(df, "text", num_merges=150)
        return bpe_encode(df, merges, "text")

    _bpe(frames["1x"]).count()  # warm-up
    for label in ("1x", "5x"):
        sec, rows = timed(_bpe, frames[label], runs=2)
        results[label]["bpe_sec"] = sec
        results[label]["bpe_rows"] = rows

    ratios = {
        op: round(results["5x"][f"{op}_sec"] / results["1x"][f"{op}_sec"], 2)
        for op in ("minhash", "ngram", "simhash", "audio",
                   "afeat", "adedup", "clusters", "decontam",
                   "analysis", "labelconf", "fuzzydecon", "canonical",
                   "semantic", "shards", "vad", "bpe")
    }
    print(json.dumps({"results": results, "growth_ratio_5x": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
