"""hash_split / pack_sequences: deterministic, shuffle-shaped right."""

import hashlib

import pytest
from pyspark.sql import functions as F

from datatest_spark.operators import hash_split, pack_sequences
from datatest_spark.operators.split import hash_split_sql_case


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id: long")


class TestHashSplit:
    def test_matches_md5_spec(self, spark, ids):
        out = {r["doc_id"]: r["split"] for r in hash_split(
            ids, "doc_id", {"train": 0.8, "eval": 0.2}, salt="s").collect()}
        for i in (0, 7, 999, 1999):
            bucket = hashlib.md5(f"{i}s".encode()).hexdigest()[:4]
            want = "train" if bucket < format(
                int(0.8 * 65536), "04x") else "eval"
            assert out[i] == want, i

    def test_proportions_and_determinism(self, spark, ids):
        fr = {"train": 0.8, "eval": 0.1, "test": 0.1}
        a = hash_split(ids, "doc_id", fr, salt="v1")
        counts = {r["split"]: r["n"] for r in
                  a.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["train"] / 2000 - 0.8) < 0.05
        assert abs(counts["eval"] / 2000 - 0.1) < 0.03
        b = hash_split(ids, "doc_id", fr, salt="v1")
        assert a.subtract(b).count() == 0  # bit-identical rerun
        c = hash_split(ids, "doc_id", fr, salt="v2")
        assert a.subtract(c).count() > 0  # salt re-rolls

    def test_fractions_must_sum_to_one(self, spark, ids):
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(ids, "doc_id", {"train": 0.5})

    def test_projection_only_no_shuffle(self, spark, ids):
        out = hash_split(ids, "doc_id", {"a": 0.5, "b": 0.5})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan

    def test_sql_case_twin_layout(self):
        case = hash_split_sql_case("doc_id", {"a": 0.25, "b": 0.75}, "z")
        assert "'4000'" in case  # 0.25 * 65536 = 0x4000
        assert case.strip().endswith("ELSE 'b' END")


class TestStratifiedSample:
    @pytest.fixture(scope="class")
    def strata(self, spark):
        rows = [(i, ["en", "fr", "de", "zz", None][i % 5])
                for i in range(2000)]
        return spark.createDataFrame(rows, "doc_id: long, lang: string")

    def test_matches_md5_spec(self, spark, strata):
        from datatest_spark.operators import stratified_sample

        fr = {"en": 0.25, "fr": 1.0, "de": 0.0}
        kept = {r["doc_id"] for r in stratified_sample(
            strata, "lang", "doc_id", fr, default=0.5, salt="m").collect()}
        for i in range(2000):
            lang = ["en", "fr", "de", "zz", None][i % 5]
            bucket = hashlib.md5(f"{i}m".encode()).hexdigest()[:4]
            frac = fr.get(lang, 0.5)
            want = frac >= 1.0 or bucket < format(int(frac * 65536), "04x")
            assert (i in kept) == want, (i, lang)

    def test_full_keep_and_full_drop(self, spark, strata):
        from datatest_spark.operators import stratified_sample

        out = stratified_sample(strata, "lang", "doc_id",
                                {"fr": 1.0}, default=0.0)
        langs = {r["lang"] for r in out.select("lang").distinct().collect()}
        assert langs == {"fr"}
        assert out.count() == 400  # every fr row, nothing else

    def test_determinism_and_salt(self, spark, strata):
        from datatest_spark.operators import stratified_sample

        fr = {"en": 0.5, "fr": 0.5}
        a = stratified_sample(strata, "lang", "doc_id", fr, salt="v1")
        b = stratified_sample(strata, "lang", "doc_id", fr, salt="v1")
        assert a.subtract(b).count() == 0
        c = stratified_sample(strata, "lang", "doc_id", fr, salt="v2")
        assert a.subtract(c).count() > 0

    def test_pure_projection_no_shuffle(self, spark, strata):
        from datatest_spark.operators import stratified_sample

        out = stratified_sample(strata, "lang", "doc_id", {"en": 0.3})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan

    def test_bad_fraction_raises(self, spark, strata):
        from datatest_spark.operators import stratified_sample

        with pytest.raises(ValueError):
            stratified_sample(strata, "lang", "doc_id", {"en": 1.5})
        with pytest.raises(ValueError):
            stratified_sample(strata, "lang", "doc_id", {}, default=-0.1)


class TestPackSequences:
    def test_greedy_bins(self, spark):
        rows = [("s", i, t) for i, t in
                enumerate([600, 600, 600, 600, 100, 2500, 10])]
        df = spark.createDataFrame(rows, "shard: string, i: long, tokens: long")
        out = {r["i"]: r["bin_id"] for r in
               pack_sequences(df, "tokens", "i", budget=1000,
                              shard_col="shard").collect()}
        # before-sums: 0, 600, 1200, 1800, 2400, 2500, 5000
        assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 5}

    def test_shards_pack_independently(self, spark):
        rows = [("a", 1, 700), ("a", 2, 700), ("b", 1, 700), ("b", 2, 700)]
        df = spark.createDataFrame(rows, "shard: string, i: long, tokens: long")
        out = pack_sequences(df, "tokens", "i", budget=1000,
                             shard_col="shard").collect()
        assert {(r["shard"], r["i"], r["bin_id"]) for r in out} == {
            ("a", 1, 0), ("a", 2, 0), ("b", 1, 0), ("b", 2, 0)}

    def test_budget_validation(self, spark):
        df = spark.createDataFrame([("a", 1, 1)],
                                   "shard: string, i: long, tokens: long")
        with pytest.raises(ValueError, match="positive"):
            pack_sequences(df, "tokens", "i", budget=0, shard_col="shard")

    def test_single_shuffle_on_shard_key(self, spark):
        df = spark.createDataFrame(
            [("a", i, 10) for i in range(50)],
            "shard: string, i: long, tokens: long")
        out = pack_sequences(df, "tokens", "i", budget=100,
                             shard_col="shard")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BatchEvalPython" not in plan
