"""decontaminate: eval-set n-gram overlap evidence rows."""

from datatest_spark.operators import decontaminate, eval_ngram_hashes


def _frames(spark):
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "completely unrelated words only here"),
            (2, "quick brown fox appears again in this text"),
            (3, "ab"),  # shorter than n: whole text is the shingle
        ],
        "doc_id: long, text: string",
    )
    evl = spark.createDataFrame(
        [(100, "the quick brown fox ran"), (101, "ab")],
        "doc_id: long, text: string",
    )
    return train, evl


class TestDecontaminate:
    def test_overlap_counts(self, spark):
        train, evl = _frames(spark)
        rows = {r["doc_id"]: r
                for r in decontaminate(train, evl, n=3).collect()}
        assert len(rows) == 4
        # eval trigrams: {the quick brown, quick brown fox, brown fox ran}
        # + the whole-text shingle "ab"
        assert rows[0]["overlap_ngrams"] == 2  # the quick brown / q b fox
        assert rows[0]["total_ngrams"] == 7
        assert rows[0]["contaminated"]
        assert rows[1]["overlap_ngrams"] == 0
        assert not rows[1]["contaminated"]
        assert rows[2]["overlap_ngrams"] == 1  # quick brown fox
        assert rows[3]["overlap_ngrams"] == 1  # short doc == eval short doc
        assert rows[3]["total_ngrams"] == 1
        assert rows[3]["contamination"] == 1.0

    def test_min_overlap_threshold(self, spark):
        train, evl = _frames(spark)
        rows = {r["doc_id"]: r["contaminated"]
                for r in decontaminate(train, evl, n=3,
                                       min_overlap=2).collect()}
        assert rows == {0: True, 1: False, 2: False, 3: False}

    def test_max_df_drops_boilerplate(self, spark):
        # a header shingle present in EVERY eval doc is dropped at
        # max_df=1, so train doc 0 no longer matches on it
        evl = spark.createDataFrame(
            [(1, "common header line alpha"), (2, "common header line beta")],
            "doc_id: long, text: string",
        )
        train = spark.createDataFrame(
            [(0, "common header line gamma")], "doc_id: long, text: string")
        with_df = decontaminate(train, evl, n=3, max_df=1).collect()[0]
        without = decontaminate(train, evl, n=3).collect()[0]
        assert without["overlap_ngrams"] == 1  # 'common header line'
        assert with_df["overlap_ngrams"] == 0

    def test_eval_side_broadcast_and_no_python_udf(self, spark):
        train, evl = _frames(spark)
        out = decontaminate(train, evl, n=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan

    def test_null_text_rows_are_skipped(self, spark):
        train = spark.createDataFrame(
            [(0, "some words here"), (1, None)], "doc_id: long, text: string")
        evl = spark.createDataFrame(
            [(9, "other words entirely")], "doc_id: long, text: string")
        got = decontaminate(train, evl, n=3).collect()
        assert [r["doc_id"] for r in got] == [0]

    def test_eval_ngram_hashes_distinct(self, spark):
        _, evl = _frames(spark)
        n = eval_ngram_hashes(evl, "text", n=3).count()
        assert n == 4  # 3 trigrams + the short doc's whole-text shingle
