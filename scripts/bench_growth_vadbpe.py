"""1x→5x growth points for the session-2 operators (VAD family + BPE).

The full harness (bench_multisf.py) already certifies the other 14
operator families in MULTISF_r05d; re-running its 500k-clip audio
stages alongside the new speech tables exceeds the sandbox's disk
budget, so the new ops get their own focused artifact: same timed()
steal-gate discipline, same 1x/5x wall-ratio report.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from bench_multisf import CACHE, CPUS, make_spark, read_steal, timed  # noqa: E402

VAD_1X = 20_000
SCALE = 5


def main():
    from pyspark.sql import functions as F

    from datatest_spark.audio import remove_silence, vad_stats
    from datatest_spark.fixtures import speech_clips_df
    from datatest_spark.operators.bpe import bpe_encode, bpe_train

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(CACHE, exist_ok=True)

    results = {}
    speech = {}
    for label, n in (("1x", VAD_1X), ("5x", SCALE * VAD_1X)):
        path = os.path.join(CACHE, f"speech_n{n}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            speech_clips_df(spark, n, parts=CPUS * 2).write.mode(
                "overwrite").parquet(path)
        speech[label] = spark.read.parquet(path)
        results[label] = {"clips": speech[label].count()}

    vad_stats(speech["1x"]).count()  # warm-up
    for label in ("1x", "5x"):
        sec, rows = timed(vad_stats, speech[label], runs=2)
        results[label]["vad_sec"] = sec
        results[label]["vad_rows"] = rows
        sec, rows = timed(remove_silence, speech[label], runs=2)
        results[label]["rmsil_sec"] = sec
        results[label]["rmsil_rows"] = rows

    # generate the scaled doc tables when the bench_multisf cache is
    # absent (fresh environment) instead of failing on the read
    from bench_multisf import scaled_documents

    docs = {}
    for label, k in (("1x", 1), ("5x", SCALE)):
        path = os.path.join(CACHE, f"docs_scaled_{k}x")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            scaled_documents(spark, k).repartition(CPUS).write.mode(
                "overwrite").parquet(path)
        docs[label] = spark.read.parquet(path)

    def _bpe(df):
        return bpe_encode(df, bpe_train(df, "text", num_merges=150),
                          "text")

    _bpe(docs["1x"]).count()  # warm-up
    for label in ("1x", "5x"):
        results[label]["docs"] = docs[label].count()
        sec, rows = timed(_bpe, docs[label], runs=2)
        results[label]["bpe_sec"] = sec
        results[label]["bpe_rows"] = rows

    ratios = {
        op: round(results["5x"][f"{op}_sec"] / results["1x"][f"{op}_sec"], 2)
        for op in ("vad", "rmsil", "bpe")
    }
    print(json.dumps({"results": results, "growth_ratio_5x": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
