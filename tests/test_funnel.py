"""curation_funnel vs a pure-Python replay of every stage."""

import hashlib

import pytest
from pyspark.sql import functions as F

from datatest_spark.operators.funnel import curation_funnel


def corpus():
    """Synthetic docs: planted exact duplicates, an invalid (empty /
    bad-lang) slice, and eval-side contamination."""
    docs = []
    for i in range(120):
        if i % 13 == 0:
            text, lang = "", "en"                      # invalid: empty
        elif i % 17 == 0:
            text, lang = f"tok{i} a b c d", "xx"       # invalid: lang
        elif i % 11 == 0:
            text, lang = "dup dup text shared body", "en"   # exact dups
        elif i % 7 == 0:
            text, lang = f"leak{i} secret eval shingle here", "en"
        else:
            text, lang = f"doc {i} unique words w{i} x{i} y{i}", "en"
        docs.append((i, text, lang))
    # eval set: contains the 3-gram "secret eval shingle"
    evals = [(1000, "the secret eval shingle appears here", "en")]
    return docs, evals


def shingles(text, n=3):
    w = text.split(" ")
    k = max(len(w) - n + 1, 1)
    return {" ".join(w[i:i + n]) for i in range(k)}


def split_of(doc_id, salt=""):
    h = hashlib.md5((str(doc_id) + salt).encode()).hexdigest()[:4]
    return "train" if h < format(int(0.9 * 65536), "04x") else "val"


def replay(docs, evals):
    valid = [d for d in docs if d[1] and d[2] == "en"]
    seen, dedup = {}, []
    for d in sorted(valid):
        if d[1] not in seen:
            seen[d[1]] = d[0]
    dedup = [d for d in valid if seen[d[1]] == d[0]]
    ev_sh = set().union(*(shingles(e[1]) for e in evals))
    clean = [d for d in dedup if not (shingles(d[1]) & ev_sh)]
    train = [d for d in clean if split_of(d[0]) == "train"]
    return {
        "valid": (len(docs), len(valid)),
        "dedup_exact": (len(valid), len(dedup)),
        "decontaminate": (len(dedup), len(clean)),
        "split_train": (len(clean), len(train)),
    }, train


class TestCurationFunnel:
    def make_frames(self, spark):
        docs, evals = corpus()
        schema = "doc_id long, text string, lang string"
        return (spark.createDataFrame(docs, schema).repartition(4),
                spark.createDataFrame(evals, schema))

    def test_report_matches_replay(self, spark):
        df, ev = self.make_frames(spark)
        docs, evals = corpus()
        want, _ = replay(docs, evals)
        got = {r["stage"]: (r["rows_in"], r["rows_out"])
               for r in curation_funnel(
                   df, ev,
                   valid_predicate=(F.col("text").isNotNull()
                                    & (F.length("text") > 0)
                                    & (F.col("lang") == "en")),
                   n=3, min_overlap=1,
                   fractions={"train": 0.9, "val": 0.1}).collect()}
        assert got == want
        # the funnel actually funnels: every stage loses rows here
        for stage, (n_in, n_out) in want.items():
            assert n_out < n_in, stage

    def test_data_mode_is_the_final_frame(self, spark):
        df, ev = self.make_frames(spark)
        docs, evals = corpus()
        want, train = replay(docs, evals)
        out = curation_funnel(
            df, ev,
            valid_predicate=(F.col("text").isNotNull()
                             & (F.length("text") > 0)
                             & (F.col("lang") == "en")),
            fractions={"train": 0.9, "val": 0.1}, emit="data")
        assert set(out.columns) == {"doc_id", "text", "lang"}
        assert sorted(r["doc_id"] for r in out.collect()) \
            == sorted(d[0] for d in train)

    def test_near_dedup_hook(self, spark):
        df, ev = self.make_frames(spark)
        docs, evals = corpus()
        # the hook prunes every doc_id divisible by 5 — replay agrees
        got = {r["stage"]: (r["rows_in"], r["rows_out"])
               for r in curation_funnel(
                   df, ev,
                   valid_predicate=(F.col("text").isNotNull()
                                    & (F.length("text") > 0)
                                    & (F.col("lang") == "en")),
                   near_dedup=lambda d: d.where(F.col("doc_id") % 5 != 0),
                   fractions={"train": 0.9, "val": 0.1}).collect()}
        want, _ = replay(docs, evals)
        assert got["valid"] == want["valid"]
        assert got["dedup_exact"] == want["dedup_exact"]
        n_dedup = want["dedup_exact"][1]
        assert got["near_dedup"][0] == n_dedup
        assert got["near_dedup"][1] < n_dedup
        assert got["decontaminate"][0] == got["near_dedup"][1]
        assert list(got) == ["valid", "dedup_exact", "near_dedup",
                             "decontaminate", "split_train"]

    def test_optional_stages_skipped(self, spark):
        df, _ = self.make_frames(spark)
        got = [r["stage"] for r in curation_funnel(df).collect()]
        assert got == ["dedup_exact"]

    def test_report_agrees_with_data_mode_across_configs(self, spark):
        """The flag-aggregate report and the staged data frame must
        agree on the final count for every stage combination."""
        df, ev = self.make_frames(spark)
        valid = (F.col("text").isNotNull() & (F.length("text") > 0)
                 & (F.col("lang") == "en"))
        hook = lambda d: d.where(F.col("doc_id") % 5 != 0)  # noqa: E731
        configs = [
            dict(),
            dict(valid_predicate=valid),
            dict(eval_df=ev),
            dict(fractions={"train": 0.8, "rest": 0.2}),
            dict(valid_predicate=valid, near_dedup=hook),
            dict(valid_predicate=valid, eval_df=ev, near_dedup=hook,
                 fractions={"train": 0.8, "rest": 0.2}, salt="s1"),
        ]
        for kw in configs:
            report = curation_funnel(df, **kw).collect()
            n_data = curation_funnel(df, emit="data", **kw).count()
            assert report[-1]["rows_out"] == n_data, kw
            # boundaries chain: each stage's rows_in is the previous
            # stage's rows_out, starting from the full input
            prev = df.count()
            for r in report:
                assert r["rows_in"] == prev, (kw, r)
                assert 0 <= r["rows_out"] <= r["rows_in"], (kw, r)
                prev = r["rows_out"]

    def test_bad_emit_rejected(self, spark):
        df, _ = self.make_frames(spark)
        with pytest.raises(ValueError, match="emit"):
            curation_funnel(df, emit="bogus")
