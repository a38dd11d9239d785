"""mixture_plan / mixture_sample / weighted_sample / corpus_overlap
vs pure-Python replays."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from datatest_spark.operators.contamination import corpus_overlap
from datatest_spark.operators.mixture import (
    mixture_plan,
    mixture_sample,
    weighted_sample,
)

WEIGHTS = {"en": 0.5, "fr": 0.3, "zh": 0.2}


def corpus():
    rows = []
    for i in range(300):
        lang = ("en", "en", "en", "fr", "fr", "zh", "de")[i % 7]
        rows.append((i, f"doc {i} words w{i % 5} x{i % 3} common tail", lang))
    return rows


def bucket(doc_id, salt=""):
    return int(hashlib.md5((str(doc_id) + salt).encode())
               .hexdigest()[:4], 16)


def replay_plan(rows):
    avail = {}
    for _i, _t, lang in rows:
        avail[lang] = avail.get(lang, 0) + 1
    strata = set(avail) | set(WEIGHTS)
    n_total = min(avail.get(s, 0) / WEIGHTS[s] for s in WEIGHTS)
    return {
        s: (avail.get(s, 0), WEIGHTS.get(s, 0.0),
            math.floor(WEIGHTS.get(s, 0.0) * n_total))
        for s in strata
    }


class TestMixture:
    def make(self, spark):
        return spark.createDataFrame(
            corpus(), "doc_id long, text string, lang string"
        ).repartition(4)

    def test_plan_matches_replay(self, spark):
        df = self.make(spark)
        want = replay_plan(corpus())
        got = {r["stratum"]: (r["available"], r["weight"], r["take"])
               for r in mixture_plan(df, "lang", WEIGHTS).collect()}
        assert got == want
        # unweighted stratum audited, not dropped
        assert got["de"][1] == 0.0 and got["de"][2] == 0

    def test_sample_matches_integer_predicate(self, spark):
        df = self.make(spark)
        plan = replay_plan(corpus())
        want = sorted(
            i for i, _t, lang in corpus()
            if bucket(i) * plan[lang][0] < plan[lang][2] * 65536
        )
        got = sorted(r["doc_id"] for r in
                     mixture_sample(df, "lang", "doc_id", WEIGHTS)
                     .collect())
        assert got == want
        assert want  # the fixture actually samples something

    def test_absent_weighted_stratum_forces_empty(self, spark):
        df = self.make(spark).where(F.col("lang") != "zh")
        plan = {r["stratum"]: r["take"] for r in
                mixture_plan(df, "lang", WEIGHTS).collect()}
        assert plan == {"en": 0, "fr": 0, "zh": 0, "de": 0}
        assert mixture_sample(df, "lang", "doc_id", WEIGHTS).count() == 0

    def test_weights_validated(self, spark):
        df = self.make(spark)
        with pytest.raises(ValueError, match="sum to 1"):
            mixture_plan(df, "lang", {"en": 0.5})
        with pytest.raises(ValueError, match="positive"):
            mixture_plan(df, "lang", {"en": 1.2, "fr": -0.2})

    def test_size_budget_plan_and_sample(self, spark):
        df = self.make(spark)
        sizes = {}
        for i, t, lang in corpus():
            sizes[lang] = sizes.get(lang, 0) + len(t)
        n_total = min(sizes.get(s, 0) / w for s, w in WEIGHTS.items())
        plan = {r["stratum"]: (r["available"], r["take"]) for r in
                mixture_plan(df.withColumn("sz", F.length("text")),
                             "lang", WEIGHTS, size_col="sz").collect()}
        for s in set(sizes) | set(WEIGHTS):
            assert plan[s] == (sizes.get(s, 0),
                               math.floor(WEIGHTS.get(s, 0.0) * n_total))
        # sample: same integer predicate, size-valued available/take
        kept = sorted(r["doc_id"] for r in mixture_sample(
            df.withColumn("sz", F.length("text")), "lang", "doc_id",
            WEIGHTS, size_col="sz").collect())
        want = sorted(
            i for i, t, lang in corpus()
            if bucket(i) * plan[lang][0] < plan[lang][1] * 65536
        )
        assert kept == want and kept

    def test_weighted_sample(self, spark):
        df = self.make(spark)
        w = F.least(F.length("text"), F.lit(40)) / F.lit(40.0)
        got = sorted(r["doc_id"]
                     for r in weighted_sample(df, w, "doc_id").collect())
        want = sorted(
            i for i, t, _l in corpus()
            if bucket(i) / 65536.0 < min(len(t), 40) / 40.0
        )
        assert got == want

    def test_weighted_sample_clamps(self, spark):
        df = self.make(spark)
        assert weighted_sample(df, F.lit(2.0), "doc_id").count() == 300
        assert weighted_sample(df, F.lit(-1.0), "doc_id").count() == 0


class TestMixtureProperties:
    """Water-filling invariants under arbitrary weight vectors."""

    def test_invariants_across_weightings(self, spark):
        df = spark.createDataFrame(
            corpus(), "doc_id long, text string, lang string")
        cases = [
            {"en": 0.9, "fr": 0.1},
            {"en": 0.25, "fr": 0.25, "zh": 0.25, "de": 0.25},
            {"zh": 1.0},
            {"en": 0.34, "fr": 0.33, "zh": 0.33},
        ]
        avail = {r["lang"]: r["n"] for r in
                 df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        for weights in cases:
            rows = mixture_plan(df, "lang", weights).collect()
            got = {r["stratum"]: r for r in rows}
            # every observed and every weighted stratum is audited
            assert set(got) == set(avail) | set(weights)
            n_total = min(avail.get(s, 0) / w for s, w in weights.items())
            for s, r in got.items():
                # take never exceeds availability (floor(w*N) <= avail)
                assert 0 <= r["take"] <= r["available"]
                assert r["take"] == math.floor(
                    weights.get(s, 0.0) * n_total)
            # the sample equals the integer-predicate replay exactly,
            # per stratum (not just deterministic): kept ids are a
            # subset of their stratum and strata with take=0 keep none
            kept = {}
            for r in (mixture_sample(df, "lang", "doc_id", weights)
                      .collect()):
                kept.setdefault(r["lang"], set()).add(r["doc_id"])
            by_lang = {}
            for i, _t, lang in corpus():
                by_lang.setdefault(lang, set()).add(i)
            for s, r in got.items():
                want_ids = {
                    i for i in by_lang.get(s, set())
                    if bucket(i) * r["available"] < r["take"] * 65536
                }
                assert kept.get(s, set()) == want_ids, (weights, s)
                assert kept.get(s, set()) <= by_lang.get(s, set())
                if r["take"] == 0:
                    assert s not in kept


def shingles(text, n=3):
    w = text.split(" ")
    k = max(len(w) - n + 1, 1)
    return {" ".join(w[i:i + n]) for i in range(k)}


class TestCorpusOverlap:
    def test_matches_set_arithmetic(self, spark):
        rows = corpus()
        schema = "doc_id long, text string, lang string"
        a_rows = [r for r in rows if r[0] % 2 == 0]
        b_rows = [r for r in rows if r[0] % 2 == 1]
        a = spark.createDataFrame(a_rows, schema)
        b = spark.createDataFrame(b_rows, schema)
        sa = set().union(*(shingles(t) for _i, t, _l in a_rows))
        sb = set().union(*(shingles(t) for _i, t, _l in b_rows))
        row = corpus_overlap(a, b, column="text", n=3).collect()[0]
        common = len(sa & sb)
        assert (row["ngrams_a"], row["ngrams_b"], row["ngrams_common"]) \
            == (len(sa), len(sb), common)
        assert row["jaccard"] == pytest.approx(
            common / len(sa | sb))
        assert row["containment_a"] == pytest.approx(common / len(sa))
        assert row["containment_b"] == pytest.approx(common / len(sb))

    def test_disjoint_corpora(self, spark):
        schema = "doc_id long, text string"
        a = spark.createDataFrame([(1, "alpha beta gamma delta")], schema)
        b = spark.createDataFrame([(2, "eps zeta eta theta")], schema)
        row = corpus_overlap(a, b).collect()[0]
        assert row["ngrams_common"] == 0 and row["jaccard"] == 0.0
