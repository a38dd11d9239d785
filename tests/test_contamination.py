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


class TestDecontaminateNeardup:
    """decontaminate_neardup: cross-corpus MinHash LSH + true Jaccard."""

    def test_exact_copy_and_truncation_found(self, spark):
        from datatest_spark.operators import decontaminate_neardup

        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
        train = spark.createDataFrame(
            [
                (0, base),                               # exact leak
                (1, base.rsplit(" ", 3)[0] + " extra"),  # near-dup leak
                (2, "totally different words in this unrelated text row"),
                (3, None),
            ],
            "doc_id: long, text: string",
        )
        evl = spark.createDataFrame(
            [(100, base), (101, "nothing in common here at all")],
            "doc_id: long, text: string",
        )
        rows = {(r["train_id"], r["eval_id"]): r["jaccard"]
                for r in decontaminate_neardup(
                    train, evl, min_jaccard=0.3).collect()}
        assert rows[(0, 100)] == 1.0          # exact copy
        assert 0.3 <= rows[(1, 100)] < 1.0    # truncated+edited copy
        assert all(t != 2 for t, _ in rows)   # unrelated never pairs

    def test_true_jaccard_matches_python(self, spark):
        from datatest_spark.operators import decontaminate_neardup

        def shingles(t, k=3):
            w = t.split(" ")
            return {" ".join(w[i:i + k])
                    for i in range(max(len(w) - k + 1, 1))}

        base = "one two three four five six seven eight nine ten"
        variant = "one two three four five six seven eight different ones"
        train = spark.createDataFrame(
            [(0, variant)], "doc_id: long, text: string")
        evl = spark.createDataFrame(
            [(9, base)], "doc_id: long, text: string")
        rows = decontaminate_neardup(train, evl, min_jaccard=0.1).collect()
        assert len(rows) == 1
        sa, sb = shingles(variant), shingles(base)
        want = round(len(sa & sb) / len(sa | sb), 4)
        assert rows[0]["jaccard"] == want

    def test_no_python_udf_and_eval_broadcast(self, spark):
        from datatest_spark.operators import decontaminate_neardup

        train = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
            "doc_id: long, text: string")
        evl = train.limit(5)
        out = decontaminate_neardup(train, evl, min_jaccard=0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan
