"""Pipeline operators: dedup, text analysis, ANN, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from datatest_spark.operators import (
    cosine_scores,
    decode_stub,
    embedding_neardup_pairs,
    exact_duplicates,
    extract_clip_features,
    fingerprint,
    ivf_topk,
    lang_id,
    minhash_neardup_pairs,
    minhash_signatures,
    simhash_neardup_pairs,
    text_quality,
    token_stats,
    topk_neighbors,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "le chat est sur la table et le chien dort"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [1.0, 0.01, 0.0, 0.0]),   # near 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestExactDedup:
    def test_duplicate_groups(self, spark, docs):
        rows = exact_duplicates(docs, "text").collect()
        assert len(rows) == 1
        assert rows[0]["dup_count"] == 2
        assert rows[0]["keep_id"] == 0
        assert rows[0]["text"] == "the quick brown fox jumps over the lazy dog"

    def test_shuffle_key_is_hash_not_body(self, spark, docs):
        """The aggregate must group on xxhash64(text), never the text
        itself (a full-body shuffle is a 100 TB scale-killer)."""
        from datatest_spark.plans.inspect import explain_str

        plan = explain_str(exact_duplicates(docs, "text"), "formatted")
        assert "xxhash64" in plan, plan
        # the corpus-wide aggregate groups on hash/length; the sample-
        # body aggregate (dup rows only) additionally carries dup_count/
        # keep_id — but the raw text column must never be a group key
        # that feeds the corpus-wide shuffle.  The corpus aggregate is
        # the one whose keys are exactly the two hash columns.
        agg_keys = [l for l in plan.splitlines() if l.strip().startswith("Keys")]
        corpus_keys = [l for l in agg_keys if "dup_count" not in l]
        assert corpus_keys and all("text#" not in l for l in corpus_keys), plan

    def test_aggregate_state_carries_no_body(self, spark, docs):
        """The corpus-wide aggregate's state must be (count, min(id))
        only: min(body) as partial-agg state ships ≈ the whole corpus
        through the shuffle on a mostly-unique dataset.  min(text) may
        appear only in the post-join aggregate over duplicate rows."""
        from datatest_spark.plans.inspect import explain_str

        plan = explain_str(exact_duplicates(docs, "text"), "formatted")
        func_lines = [
            l for l in plan.splitlines() if l.strip().startswith("Functions")
        ]
        corpus_aggs = [l for l in func_lines if "count(" in l]
        assert corpus_aggs, plan
        assert all("text#" not in l for l in corpus_aggs), plan
        # a broadcast join brings the (tiny) dup-group keys back
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan

    def test_no_storage_growth_across_repeated_calls(self, spark, docs):
        """LSH operators persist intermediates; repeated IDENTICAL
        calls in a long-lived session must not accumulate cached frames
        (Spark's CacheManager reuses the cached plan), and
        unpersist_cached frees everything."""
        from datatest_spark.operators.dedup import unpersist_cached

        sc = spark.sparkContext
        unpersist_cached(blocking=True)
        base = sc._jsc.getPersistentRDDs().size()
        for _ in range(3):
            minhash_neardup_pairs(
                docs, "text", num_hashes=16, bands=8, min_jaccard=0.2
            ).collect()
            simhash_neardup_pairs(docs, "text").collect()
            assert sc._jsc.getPersistentRDDs().size() <= base + 2
        unpersist_cached(blocking=True)
        assert sc._jsc.getPersistentRDDs().size() <= base

    def test_interleaved_calls_keep_both_caches(self, spark, docs):
        """Per-call CacheHandles: starting operator B before
        materializing operator A's result must NOT evict A's persisted
        intermediates (the old global evict-on-entry registry did,
        forcing a silent recompute); each result frees exactly its own
        set via unpersist_result."""
        from datatest_spark.caching import unpersist_result
        from datatest_spark.operators.dedup import unpersist_cached

        unpersist_cached(blocking=True)
        a = minhash_neardup_pairs(
            docs, "text", num_hashes=16, bands=8, min_jaccard=0.2
        )
        b = simhash_neardup_pairs(docs, "text")  # interleaved call
        a.collect()
        b.collect()
        ha = a._datatest_cache_handle
        hb = b._datatest_cache_handle
        assert ha._frames and all(f.is_cached for f in ha._frames)
        assert hb._frames and all(f.is_cached for f in hb._frames)
        assert unpersist_result(a, blocking=True) >= 1
        assert not ha._frames  # a's set freed...
        assert hb._frames and all(f.is_cached for f in hb._frames)  # ...b's not
        assert unpersist_result(b, blocking=True) >= 1
        assert not hb._frames
        assert unpersist_result(a) == 0  # idempotent

    def test_gc_auto_evicts_dropped_result(self, spark, docs):
        """Weakref backstop: dropping the last reference to an operator
        result auto-unpersists its intermediates at GC, so sessions
        that loop over dedup operators without calling
        unpersist_result stay bounded."""
        import gc

        from datatest_spark.operators.dedup import _HANDLES, unpersist_cached

        unpersist_cached(blocking=True)
        a = minhash_neardup_pairs(
            docs, "text", num_hashes=16, bands=8, min_jaccard=0.2
        )
        a.collect()
        handle = a._datatest_cache_handle
        assert handle._frames and handle in _HANDLES
        del a
        gc.collect()
        assert not handle._frames  # intermediates evicted by finalizer
        assert handle not in _HANDLES


class TestMinHash:
    def test_signatures_deterministic(self, spark, docs):
        a = minhash_signatures(docs, "text", num_hashes=16).collect()
        b = minhash_signatures(docs, "text", num_hashes=16).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))

    def test_neardup_pairs(self, spark, docs):
        pairs = minhash_neardup_pairs(
            docs, "text", num_hashes=32, bands=16, min_jaccard=0.4
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 3) in found  # exact dup: jaccard 1.0
        exact = [r for r in pairs if (r["id_a"], r["id_b"]) == (0, 3)]
        assert exact[0]["est_jaccard"] == 1.0
        # near-dup 0/1 share most shingles
        assert (0, 1) in found
        # unrelated docs must not pair
        assert (2, 4) not in found


class TestMinHashExactVerify:
    def test_exact_jaccard_pairs(self, spark, docs):
        """exact=True verifies LSH candidates by TRUE shingle Jaccard."""
        pairs = minhash_neardup_pairs(
            docs, "text", num_hashes=32, bands=16, min_jaccard=0.4, exact=True
        ).collect()
        found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        assert found.get((0, 3)) == 1.0  # exact dup
        # 0 vs 1: 9 tokens → 7 shingles each, 6 shared distinct
        # jaccard = 6 / 8 = 0.75
        assert found.get((0, 1)) == 0.75
        assert (2, 4) not in found

    def test_bucket_cap_bounds_skew(self, spark):
        """1k identical docs: without the cap the self-join is ~500k
        pairs per band; the cap drops the hot bucket entirely."""
        rows = [(i, "same boilerplate text repeated everywhere") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        capped = minhash_neardup_pairs(
            df, "text", min_jaccard=None, max_bucket_size=100
        )
        assert capped.count() == 0  # hot bucket dropped, no quadratic join


class TestSimHash:
    def test_exact_dups_hamming_zero(self, spark, docs):
        pairs = simhash_neardup_pairs(docs, "text", max_hamming=3).collect()
        found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        assert found.get((0, 3)) == 0

    def test_signatures_deterministic_across_sessions(self, spark, docs):
        """xxhash64 token hashes → the signature is a pure function of
        the text (builtin hash() would vary with PYTHONHASHSEED)."""
        from datatest_spark.operators import simhash_signatures

        a = {r["doc_id"]: r["simhash"]
             for r in simhash_signatures(docs, "text").collect()}
        b = {r["doc_id"]: r["simhash"]
             for r in simhash_signatures(docs.repartition(7), "text").collect()}
        assert a == b
        assert a[0] == a[3]  # exact dups share signatures


class TestEmbeddingDedup:
    def test_neardup_cosine(self, spark, vectors):
        pairs = embedding_neardup_pairs(
            vectors, planes=4, min_cosine=0.95
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 4) in found or (0, 1) in found


class TestANN:
    def test_topk_exact(self, spark, vectors):
        rows = topk_neighbors(vectors, [1.0, 0.0, 0.0, 0.0], k=3).collect()
        assert rows[0]["vec_id"] == 0 and rows[0]["cosine"] == 1.0
        assert {r["vec_id"] for r in rows} == {0, 1, 4}

    def test_cosine_scores_threshold(self, spark, vectors):
        rows = cosine_scores(vectors, query_id=0, min_score=0.9).collect()
        assert {r["vec_id"] for r in rows} == {0, 1, 4}

    def test_ivf_finds_neighbors(self, spark, vectors):
        rows = ivf_topk(
            vectors, [1.0, 0.0, 0.0, 0.0], k=2, n_cells=2, nprobe=2,
        ).collect()
        assert rows[0]["vec_id"] == 0

    def test_ivf_injected_training_reproducible(self, spark, vectors):
        """train_vectors makes the index a pure function of inputs —
        no sampling scan, identical results across runs."""
        train = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0], [0.9, 0.1, 0.0, 0.0]]
        a = ivf_topk(vectors, [1.0, 0.0, 0.0, 0.0], k=3, n_cells=2,
                     nprobe=1, train_vectors=train).collect()
        b = ivf_topk(vectors, [1.0, 0.0, 0.0, 0.0], k=3, n_cells=2,
                     nprobe=1, train_vectors=train).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert a[0]["vec_id"] == 0 and a[0]["cosine"] == 1.0


class TestKnnJoin:
    def test_matches_per_query_topk(self, spark, vectors):
        """knn_join's result per query must equal topk_neighbors run
        separately for that query vector (same round-6 + id ordering)."""
        from datatest_spark.operators import knn_join, topk_neighbors

        queries = vectors.filter(F.col("vec_id") < 2)
        got = knn_join(vectors, queries, k=3).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(
                (r["neighbor_id"], r["cosine"])
            )
        for qid in (0, 1):
            qv = [
                float(v)
                for v in vectors.filter(F.col("vec_id") == qid)
                .select("embedding").first()[0]
            ]
            expect = [
                (r["vec_id"], r["cosine"])
                for r in topk_neighbors(vectors, qv, k=3).collect()
            ]
            assert by_q[qid] == expect, (qid, by_q[qid], expect)

    def test_local_topk_bounds_shuffle(self, spark, vectors):
        """The plan must be mapInPandas (vectorized local top-k) → one
        window; no cross-join materialization of |corpus|x|queries|."""
        from datatest_spark.operators import knn_join

        out = knn_join(vectors, vectors.limit(2), k=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan

    def test_query_bound_enforced(self, spark, vectors):
        from datatest_spark.operators import knn_join

        with pytest.raises(ValueError):
            knn_join(vectors, vectors, k=2, max_queries=3)


class TestIvfKnnJoin:
    TRAIN = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]

    def test_probe_all_equals_brute_force(self, spark, vectors):
        """nprobe >= n_cells probes every cell, so the result must be
        EXACTLY knn_join's — certifies routing + per-cell scoring."""
        from datatest_spark.operators import ivf_build, ivf_knn_join, knn_join

        index = ivf_build(vectors, n_cells=3, train_vectors=self.TRAIN)
        queries = vectors.filter(F.col("vec_id") < 3)
        a = sorted(map(tuple, ivf_knn_join(index, queries, k=3,
                                           nprobe=3).collect()))
        b = sorted(map(tuple, knn_join(vectors, queries, k=3).collect()))
        assert a == b

    def test_single_probe_prunes_cells(self, spark, vectors):
        """nprobe=1: each query scores only its own cell's rows — the
        x-axis query must see only the x-cluster (ids 0, 1, 4)."""
        from datatest_spark.operators import ivf_build, ivf_knn_join

        index = ivf_build(vectors, n_cells=3, train_vectors=self.TRAIN)
        queries = vectors.filter(F.col("vec_id") == 0)
        rows = ivf_knn_join(index, queries, k=5, nprobe=1).collect()
        assert {r["neighbor_id"] for r in rows} == {0, 1, 4}

    def test_distributed_probe_all_equals_brute_force(self, spark, vectors):
        """knn_join_distributed with nprobe=n_cells must equal
        knn_join exactly (same rounding, same tie-break) — certifies
        the JVM probe routing, per-cell cogroup scoring, and the
        global window."""
        from datatest_spark.operators import (
            ivf_build, knn_join, knn_join_distributed)

        index = ivf_build(vectors, n_cells=3, train_vectors=self.TRAIN)
        queries = vectors.filter(F.col("vec_id") < 3)
        a = sorted(map(tuple, knn_join_distributed(
            index, queries, k=3, nprobe=3).collect()))
        b = sorted(map(tuple, knn_join(vectors, queries, k=3).collect()))
        assert a == b

    def test_distributed_single_probe_prunes(self, spark, vectors):
        from datatest_spark.operators import ivf_build, knn_join_distributed

        index = ivf_build(vectors, n_cells=3, train_vectors=self.TRAIN)
        queries = vectors.filter(F.col("vec_id") == 0)
        rows = knn_join_distributed(index, queries, k=5, nprobe=1).collect()
        assert {r["neighbor_id"] for r in rows} == {0, 1, 4}

    def test_distributed_handles_100k_queries(self, spark):
        """The whole point: a query set 10x past knn_join's broadcast
        bound runs with NO driver collect and no exception.  100k
        synthetic queries against a 2k corpus, 16 cells, nprobe=2 —
        each query's neighbors must come back (k rows each) and a
        spot-checked query must rank its exact-duplicate corpus row
        first with cosine 1.0."""
        from datatest_spark.operators import ivf_build, knn_join_distributed

        corpus = spark.range(2000).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.sin(F.col("id") * F.lit(0.7) + F.lit(d))
                      for d in range(4)]).alias("embedding"),
        )
        queries = spark.range(100_000).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.sin((F.col("id") % 2000) * F.lit(0.7) + F.lit(d))
                      for d in range(4)]).alias("embedding"),
        )
        import math

        train = [[math.sin(i * 0.7 + d) for d in range(4)]
                 for i in range(0, 2000, 40)]
        index = ivf_build(corpus, n_cells=16, train_vectors=train)
        out = knn_join_distributed(index, queries, k=3, nprobe=2)
        per_q = out.groupBy("query_id").count()
        assert per_q.count() == 100_000
        assert per_q.agg(F.max("count")).collect()[0][0] == 3
        # query 123456 % 2000 = ... pick qid 4321 → corpus 321 duplicate
        top = (out.filter(F.col("query_id") == 4321)
               .orderBy(F.col("cosine").desc()).first())
        assert top["neighbor_id"] == 4321 % 2000
        assert top["cosine"] == 1.0

    def test_written_index_prunes_scan(self, spark, vectors, tmp_path):
        """Against a written (cell-partitioned) index, the probed-cell
        filter must reach the parquet scan as a PartitionFilter."""
        from datatest_spark.operators import IvfIndex, ivf_build, ivf_knn_join

        index = ivf_build(vectors, n_cells=3, train_vectors=self.TRAIN)
        path = str(tmp_path / "ivf_knn")
        index.write(path)
        back = IvfIndex.read(spark, path)
        queries = vectors.filter(F.col("vec_id") == 0)
        out = ivf_knn_join(back, queries, k=2, nprobe=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan.split(
            "PartitionFilters"
        )[1][:120], plan
        assert out.count() >= 1


class TestIvfRecall:
    TRAIN = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]

    def test_full_probe_is_exact_and_pruning_is_measured(self, spark,
                                                         vectors):
        """Closed-form recall on the 3-cell fixture: at nprobe=n_cells
        recall must be exactly 1.0; at nprobe=1 queries 0/1/4 keep
        their whole top-3 inside cell x (recall 1) while queries 2 and
        3 sit in singleton cells and recover only themselves (recall
        1/3) → mean 11/15, min 1/3."""
        from datatest_spark.operators import ivf_build, ivf_recall

        index = ivf_build(vectors, n_cells=3, train_vectors=self.TRAIN)
        rows = {r["nprobe"]: r for r in
                ivf_recall(index, vectors, k=3, nprobes=(1, 3)).collect()}
        assert rows[3]["mean_recall"] == 1.0
        assert rows[3]["min_recall"] == 1.0
        assert rows[1]["n_queries"] == 5
        assert rows[1]["mean_recall"] == pytest.approx(11 / 15, abs=1e-6)
        assert rows[1]["min_recall"] == pytest.approx(1 / 3, abs=1e-6)


class TestTextOps:
    def test_token_stats(self, spark, docs):
        rows = {r["doc_id"]: r for r in token_stats(docs, "text").collect()}
        assert rows[0]["n_tokens"] == 9
        # 9 space-prefixed letter runs = 9 BPE-ish tokens for plain prose
        assert rows[0]["n_bpe_tokens"] == 9
        assert rows[0]["n_chars_calc"] == len(
            "the quick brown fox jumps over the lazy dog"
        )

    def test_bpe_tokens_segment_mixed_text(self, spark):
        """Digit runs, punctuation runs and residual spaces segment
        separately (the GPT-2-style pre-tokenizer shape)."""
        df = spark.createDataFrame(
            [(0, "hello world, it's 2026!"), (1, "a  b"), (2, "")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in token_stats(df, "text").collect()}
        # ' ?letters' x4 + ',' + "'" + ' ?digits' + '!' = 8
        assert rows[0]["n_bpe_tokens"] == 8
        assert rows[1]["n_bpe_tokens"] == 3  # 'a', ' ', ' b'
        assert rows[2]["n_bpe_tokens"] == 0

    def test_token_stats_awkward_column_names(self, spark):
        """Column names with spaces/dots/quotes must work — the BPE
        expression is built from Columns, not an f-string into
        F.expr (which such names would break or inject into)."""
        df = spark.createDataFrame(
            [(0, "hello world")], "doc_id long, text string"
        ).withColumnRenamed("text", "doc text, isn't it")
        rows = token_stats(df, "doc text, isn't it").collect()
        assert rows[0]["n_tokens"] == 2
        assert rows[0]["n_bpe_tokens"] == 2

    def test_repetition_stats_counts(self, spark):
        from datatest_spark.operators import repetition_stats

        df = spark.createDataFrame(
            [
                (0, "a b a b a b c"),  # 2-grams ab:3 ba:2 bc:1
                (1, "x y z w"),        # nothing repeats
                (2, "hi"),             # shorter than n
                (3, None),             # dropped
            ],
            "doc_id: long, text: string",
        )
        rows = {r["doc_id"]: r
                for r in repetition_stats(df, "text", ngrams=(2,)).collect()}
        assert set(rows) == {0, 1, 2}
        assert rows[0]["ngrams_2"] == 6
        assert rows[0]["top_ngram_2"] == 3
        assert rows[0]["dup_ngrams_2"] == 5  # ab x3 + ba x2
        assert rows[0]["top_frac_2_r"] == 0.5
        assert rows[0]["dup_frac_2_r"] == 0.8333
        assert rows[1]["dup_ngrams_2"] == 0
        assert rows[2]["ngrams_2"] == 1 and rows[2]["dup_frac_2_r"] == 0.0

    def test_repetition_stats_matches_counter(self, spark):
        """Run-length-on-sorted-array must equal a Counter-based
        frequency table on random word soup."""
        import random
        from collections import Counter

        from datatest_spark.operators import repetition_stats

        rng = random.Random(11)
        texts = [
            " ".join(rng.choice("aa bb cc dd".split())
                     for _ in range(rng.randrange(1, 40)))
            for _ in range(30)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id: long, text: string")
        rows = {r["doc_id"]: r
                for r in repetition_stats(df, "text", ngrams=(3,)).collect()}
        for i, t in enumerate(texts):
            w = t.split(" ")
            grams = [" ".join(w[j:j + 3])
                     for j in range(max(len(w) - 2, 1))]
            freq = Counter(grams)
            assert rows[i]["ngrams_3"] == len(grams), i
            assert rows[i]["top_ngram_3"] == max(freq.values()), i
            assert rows[i]["dup_ngrams_3"] == sum(
                c for c in freq.values() if c >= 2), i

    def test_repetition_stats_projection_only(self, spark, docs):
        from datatest_spark.operators import repetition_stats

        out = repetition_stats(docs, "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan

    def test_unigram_logprob_closed_form(self, spark):
        import math

        from datatest_spark.operators import unigram_logprob

        df = spark.createDataFrame(
            [(0, "a a b"), (1, "b c"), (2, None)],
            "doc_id: long, text: string",
        )
        # counts a:2 b:2 c:1 → N=5, V=3, denom=9; vocab_size=2 keeps
        # {a, b} (count-desc, token-asc tie-break), c is OOV
        rows = {r["doc_id"]: r
                for r in unigram_logprob(df, "text", vocab_size=2).collect()}
        assert set(rows) == {0, 1}
        r0, r1 = rows[0], rows[1]
        assert (r0["n_tokens"], r0["n_oov"]) == (3, 0)
        assert r0["logprob_r"] == round(math.log(3 / 9), 4)
        assert r0["ppl_r"] == 3.0
        assert (r1["n_tokens"], r1["n_oov"]) == (2, 1)
        mean1 = (math.log(3 / 9) + math.log(1 / 9)) / 2
        assert r1["logprob_r"] == round(mean1, 4)
        assert r1["ppl_r"] == round(math.exp(-mean1), 2)

    def test_unigram_logprob_matches_counter_lm(self, spark):
        """Engine LM == a pure-Python refit (Counter + add-one
        smoothing + top-K tie-broken vocab) on random word soup."""
        import math
        import random
        from collections import Counter

        from datatest_spark.operators import unigram_logprob

        rng = random.Random(23)
        words = "aa bb cc dd ee ff gg hh".split()
        texts = [" ".join(rng.choice(words)
                          for _ in range(rng.randrange(1, 30)))
                 for _ in range(40)]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id: long, text: string")
        k = 4
        rows = {r["doc_id"]: r
                for r in unigram_logprob(df, "text", vocab_size=k).collect()}

        freq = Counter(t for x in texts for t in x.split(" "))
        n_total, v_full = sum(freq.values()), len(freq)
        denom = n_total + v_full + 1
        vocab = dict(sorted(freq.items(),
                            key=lambda kv: (-kv[1], kv[0]))[:k])
        for i, t in enumerate(texts):
            toks = t.split(" ")
            lps = [math.log((vocab.get(w, 0) + 1) / denom) for w in toks]
            r = rows[i]
            assert r["n_tokens"] == len(toks), i
            assert r["n_oov"] == sum(w not in vocab for w in toks), i
            assert r["logprob_r"] == round(sum(lps) / len(lps), 4), i

    def test_unigram_logprob_full_vocab_no_oov(self, spark, docs):
        from datatest_spark.operators import unigram_logprob

        out = unigram_logprob(docs, "text", vocab_size=100_000)
        assert out.agg({"n_oov": "sum"}).first()[0] == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan

    def test_text_quality_ttr(self, spark, docs):
        rows = {r["doc_id"]: r for r in text_quality(docs, "text").collect()}
        assert rows[0]["n_types"] == 8  # 'the' twice
        assert abs(rows[0]["ttr_r"] - round(8 / 9, 4)) < 1e-9

    def test_text_quality_punct_and_stopword_ratios(self, spark):
        df = spark.createDataFrame(
            [(0, "the cat, the hat!"), (1, "alpha beta gamma")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in text_quality(df, "text").collect()}
        # 2 punct chars (',' '!') of 17 chars
        assert rows[0]["punct_ratio_r"] == round(2 / 17, 4)
        # tokens: the, 'cat,', the, 'hat!' → 2 stopwords of 4 tokens
        # (punctuation-attached tokens don't match the stopword list)
        assert rows[0]["stopword_ratio_r"] == 0.5
        assert rows[1]["punct_ratio_r"] == 0.0
        assert rows[1]["stopword_ratio_r"] == 0.0

    def test_lang_id(self, spark, docs):
        rows = {r["doc_id"]: r for r in lang_id(docs, "text").collect()}
        assert rows[0]["lang_guess"] == "en"
        assert rows[4]["lang_guess"] == "fr"

    def test_fingerprint_deterministic(self, spark, docs):
        a = {r["doc_id"]: (r["text_hash"], r["shingle_min_hash"])
             for r in fingerprint(docs, "text").collect()}
        assert a[0] == a[3]  # exact dups share fingerprints
        assert a[0] != a[2]

    def test_fingerprint_null_text_is_null(self, spark):
        """Spark xxhash64(NULL) returns the seed (42); the operator
        must guard so null text fingerprints as NULL (oracle parity)."""
        df = spark.createDataFrame(
            [(0, None), (1, "some text")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in fingerprint(df, "text").collect()}
        assert rows[0]["text_hash"] is None
        assert rows[0]["shingle_min_hash"] is None
        assert rows[1]["text_hash"] is not None


class TestMultimodal:
    def test_decode_stub_raises_without_fake(self, spark):
        df = spark.createDataFrame([(1, b"not-an-image")], "id long, payload binary")
        with pytest.raises(Exception) as exc:
            decode_stub(df, "payload").collect()
        assert "NotImplementedError" in str(exc.value) or "codec libraries" in str(exc.value)

    def test_decode_stub_fake_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, b"payload-a"), (2, b"payload-b"), (3, None)],
            "id long, payload binary",
        )
        rows = {r["id"]: r for r in decode_stub(df, "payload", fake=True).collect()}
        assert rows[1]["ok"] and rows[2]["ok"] and not rows[3]["ok"]
        again = {r["id"]: r for r in decode_stub(df, "payload", fake=True).collect()}
        assert rows[1]["width"] == again[1]["width"]
        assert rows[1]["payload_sha256"] != rows[2]["payload_sha256"]

    def test_audio_frame_features_real(self, spark):
        from datatest_spark.fixtures import audio_clips_df

        df = audio_clips_df(spark, 20, parts=2)
        rows = extract_clip_features(df, frame_ms=100).collect()
        ok = [r for r in rows if r["ok"]]
        assert len(ok) >= 18
        assert all(len(r["frame_rms"]) >= 2 for r in ok)
        assert all(v >= 0 for r in ok for v in r["frame_rms"])


class TestNgramJaccard:
    def test_exact_jaccard_values(self, spark, docs):
        from datatest_spark.operators import ngram_jaccard_pairs

        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard_r"]
            for r in ngram_jaccard_pairs(
                docs, "text", n=3, min_jaccard=0.1, max_df=None
            ).collect()
        }
        # exact dup: identical 3-gram sets → Jaccard 1.0
        assert pairs[(0, 3)] == 1.0
        # near-dup 0/1: 9 words → 7 shingles each; only the final
        # window ("the lazy dog/cat") differs → 6 / (7+7-6)
        assert pairs[(0, 1)] == 0.75
        assert (0, 2) not in pairs  # disjoint shingle sets

    def test_min_jaccard_filters(self, spark, docs):
        from datatest_spark.operators import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(
            docs, "text", n=3, min_jaccard=0.9, max_df=None
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 3)}

    def test_max_df_removes_common_shingles(self, spark):
        from datatest_spark.operators import ngram_jaccard_pairs

        # boilerplate shingle "common boiler plate" in every doc; the
        # distinct tails only.  With max_df=2 the boilerplate shingles
        # (df=3) leave the similarity space → all pairs disjoint.
        rows = [
            (0, "common boiler plate alpha beta gamma"),
            (1, "common boiler plate delta epsilon zeta"),
            (2, "common boiler plate eta theta iota"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        with_cap = ngram_jaccard_pairs(
            df, "text", n=3, min_jaccard=0.01, max_df=2
        ).collect()
        assert with_cap == []
        no_cap = ngram_jaccard_pairs(
            df, "text", n=3, min_jaccard=0.01, max_df=None
        ).collect()
        assert len(no_cap) == 3  # boilerplate makes every pair similar

    def test_shuffle_carries_longs_not_text(self, spark, docs):
        from datatest_spark.operators import ngram_jaccard_pairs

        plan = ngram_jaccard_pairs(
            docs, "text", n=3, min_jaccard=0.1
        )._jdf.queryExecution().executedPlan().toString()
        # the posting-list exchanges must partition on the hashed
        # shingle long / ids — never on the shingle text
        import re

        for m in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
            assert "text" not in m, plan

    def test_df_cap_is_partial_agg_not_window(self, spark, docs):
        """The max_df stop-shingle cap must compile to a map-side-
        combined groupBy(g).count() + broadcast left-anti join.  A
        count-over-window on the postings would buffer each hot
        shingle's ENTIRE posting list on one task before filtering —
        the exact boilerplate skew the cap exists to remove."""
        from datatest_spark.operators import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(docs, "text", n=3, min_jaccard=0.1,
                                  max_df=100)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        assert "LeftAnti" in plan, plan
        # the doc-frequency count must pre-aggregate map-side: a
        # partial_count on the shingle key before its exchange
        assert "partial_count" in plan, plan


class TestImageOps:
    def test_decode_images_mixed_formats(self, spark):
        from datatest_spark.fixtures import image_table_df
        from datatest_spark.operators import decode_images

        imgs = image_table_df(spark, 200, parts=4)
        out = {r["id"]: r for r in
               decode_images(imgs, "bytes", id_col="image_id").collect()}
        assert len(out) == 200
        # corrupt rows (i%97==13) fail decode, everything else succeeds
        bad = {f"img-{i:012d}" for i in range(200) if i % 97 == 13}
        assert {k for k, r in out.items() if not r["ok"]} == bad
        codecs = {r["codec"] for r in out.values() if r["ok"]}
        assert codecs == {"ppm", "bmp"}

    def test_dhash_links_cross_format_duplicates(self, spark):
        from datatest_spark.fixtures import image_table_df
        from datatest_spark.operators import image_features
        from pyspark.sql import functions as F

        imgs = image_table_df(spark, 120, parts=4)
        feats = image_features(imgs, "bytes", id_col="image_id")
        by_id = {r["id"]: r for r in feats.collect()}
        # i=57, 107 duplicate pixels of i-1 in the OTHER container:
        # same dHash + same dims, different codec + different sha-bytes
        for i in (57, 107):
            a, b = by_id[f"img-{i-1:012d}"], by_id[f"img-{i:012d}"]
            assert a["dhash"] == b["dhash"]
            assert (a["width"], a["height"]) == (b["width"], b["height"])
            assert a["codec"] != b["codec"]

    def test_declared_width_lie_detectable(self, spark):
        from datatest_spark.fixtures import image_table_df
        from datatest_spark.operators import decode_images
        from pyspark.sql import functions as F

        imgs = image_table_df(spark, 200, parts=4)
        dec = decode_images(imgs, "bytes", id_col="image_id")
        joined = dec.filter("ok").join(
            imgs.select("image_id", "decl_width"),
            dec["id"] == F.col("image_id"),
        )
        liars = sorted(
            r["id"] for r in
            joined.filter(F.col("decl_width") != F.col("width")).collect()
        )
        expect = sorted(
            f"img-{i:012d}" for i in range(200)
            if i % 53 == 29 and i % 97 != 13
        )
        assert liars == expect


class TestVideoOps:
    def test_frame_features_and_sampling(self, spark):
        from datatest_spark.fixtures import (
            synth_video_frames, video_table_df,
        )
        from datatest_spark.operators import video_frame_features

        vids = video_table_df(spark, 60, parts=2)
        full = {r["id"]: r for r in
                video_frame_features(vids, "bytes", id_col="video_id",
                                     every_nth=1).collect()}
        bad = {f"vid-{i:012d}" for i in range(60) if i % 89 == 11}
        assert {k for k, r in full.items() if not r["ok"]} == bad
        # frame counts and per-frame luma match the synth definition
        for i in (0, 7, 23):
            frames = synth_video_frames(i)
            row = full[f"vid-{i:012d}"]
            assert row["n_frames_sampled"] == frames.shape[0]
            expect = [float(frames[k, :, :, 0].mean())
                      for k in range(frames.shape[0])]
            assert row["frame_mean_luma"] == pytest.approx(expect)
        sampled = {r["id"]: r for r in
                   video_frame_features(vids, "bytes", id_col="video_id",
                                        every_nth=2).collect()}
        for i in (0, 7, 23):
            n = synth_video_frames(i).shape[0]
            assert sampled[f"vid-{i:012d}"]["n_frames_sampled"] == (n + 1) // 2


class TestImageSuite:
    def test_violations_match_fixture_injections(self, spark):
        from datatest_spark.fixtures import image_table_df
        from datatest_spark.suite import validate_image_table
        from pyspark.sql import functions as F

        imgs = image_table_df(spark, 300, parts=4)
        res = validate_image_table(imgs)
        by_rule = {
            r["rule_id"]: r["cnt"]
            for r in res.violations.groupBy("rule_id")
            .agg(F.count("*").alias("cnt")).collect()
        }
        n_corrupt = len([i for i in range(300) if i % 97 == 13])
        n_lie = len([i for i in range(300) if i % 53 == 29 and i % 97 != 13])
        assert by_rule.get("image:decodable") == n_corrupt
        assert by_rule.get("image:width") == n_lie
        assert "image:height" not in by_rule
        assert "regex:image_id" not in by_rule
        # width lies are exactly +7 with the decoded width as expected
        dev = res.violations.filter(F.col("rule_id") == "image:width")
        assert all(r["deviation"] == 7.0 for r in dev.collect())
        # per-partition verdicts carry the violations
        assert res.violations.filter(
            F.col("partition_id").isNull()
        ).count() == 0


class TestVideoSuite:
    def test_violations_match_fixture_injections(self, spark):
        from datatest_spark.fixtures import video_table_df
        from datatest_spark.suite import validate_video_table
        from pyspark.sql import functions as F

        vids = video_table_df(spark, 250, parts=4)
        res = validate_video_table(vids)
        by_rule = {
            r["rule_id"]: r["cnt"]
            for r in res.violations.groupBy("rule_id")
            .agg(F.count("*").alias("cnt")).collect()
        }
        n_corrupt = len([i for i in range(250) if i % 89 == 11])
        n_lie = len([i for i in range(250) if i % 31 == 5 and i % 89 != 11])
        assert by_rule.get("video:decodable") == n_corrupt
        assert by_rule.get("video:frames") == n_lie
        dev = res.violations.filter(F.col("rule_id") == "video:frames")
        assert all(r["deviation"] == 2.0 for r in dev.collect())


class TestCodecProperties:
    """Property-based round-trips for the from-scratch codecs: any
    uint8 image/video payload must survive encode→decode bit-exactly
    (the invariant every other image/video result rests on)."""

    def test_ppm_bmp_roundtrip_property(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        from datatest_spark.operators.image import (
            decode_bmp, decode_ppm, encode_bmp, encode_ppm,
        )

        @settings(max_examples=40, deadline=None)
        @given(
            h=st.integers(1, 40), w=st.integers(1, 40),
            seed=st.integers(0, 2**31 - 1),
        )
        def roundtrip(h, w, seed):
            arr = np.random.RandomState(seed).randint(
                0, 256, (h, w, 3), dtype=np.uint8
            )
            assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
            assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)

        roundtrip()

    def test_y4m_roundtrip_property(self):
        import numpy as np
        from hypothesis import given, settings, strategies as st

        from datatest_spark.operators.video import (
            count_y4m_frames, encode_y4m, iter_y4m_frames,
        )

        @settings(max_examples=25, deadline=None)
        @given(
            n=st.integers(1, 6), h=st.integers(2, 24),
            w=st.integers(2, 24), seed=st.integers(0, 2**31 - 1),
        )
        def roundtrip(n, h, w, seed):
            frames = np.random.RandomState(seed).randint(
                0, 256, (n, h, w, 3), dtype=np.uint8
            )
            buf = encode_y4m(frames)
            assert count_y4m_frames(buf) == (w, h, n)
            out = list(iter_y4m_frames(buf, 1))
            assert len(out) == n
            assert all(np.array_equal(f, frames[i]) for i, f in out)

        roundtrip()

    def test_truncated_payloads_always_raise(self):
        from hypothesis import given, settings, strategies as st

        from datatest_spark.fixtures import synth_image_array
        from datatest_spark.operators.image import (
            decode_image_bytes, encode_bmp, encode_ppm,
        )

        @settings(max_examples=40, deadline=None)
        @given(i=st.integers(0, 500), cut=st.floats(0.01, 0.95),
               bmp=st.booleans())
        def truncation(i, cut, bmp):
            arr = synth_image_array(i)
            buf = (encode_bmp if bmp else encode_ppm)(arr)
            short = buf[: max(2, int(len(buf) * cut))]
            # either decodes to the full image (header happens to fit,
            # impossible after pixel truncation) or raises ValueError —
            # never crashes, never returns partial pixels
            import pytest as _pytest

            if len(short) < len(buf):
                with _pytest.raises(ValueError):
                    decode_image_bytes(short)

        truncation()


class TestIvfIndex:
    def test_build_query_matches_single_shot(self, spark, vectors):
        from datatest_spark.operators import ivf_build, ivf_query, ivf_topk

        train = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0]]
        q = [1.0, 0.05, 0.0, 0.0]
        index = ivf_build(vectors, n_cells=3, train_vectors=train)
        a = ivf_query(index, q, k=3, nprobe=2).collect()
        b = ivf_topk(vectors, q, k=3, n_cells=3, nprobe=2,
                     train_vectors=train).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        # second query reuses the SAME index — no retraining
        c = ivf_query(index, [0.0, 1.0, 0.1, 0.0], k=2, nprobe=1).collect()
        assert len(c) >= 1

    def test_written_index_prunes_partitions(self, spark, vectors, tmp_path):
        from datatest_spark.operators import IvfIndex, ivf_build, ivf_query

        train = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0]]
        index = ivf_build(vectors, n_cells=3, train_vectors=train)
        path = str(tmp_path / "ivf")
        index.write(path)
        back = IvfIndex.read(spark, path)
        q = [1.0, 0.05, 0.0, 0.0]
        out = ivf_query(back, q, k=3, nprobe=1)
        # the probe filter must reach the parquet scan as a partition
        # filter (cell is the partition column of the written index)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan.split(
            "PartitionFilters"
        )[1][:120], plan
        rows = out.collect()
        # the probed cell holds the x-axis cluster: 4 ([1, .01]) edges
        # out 0 ([1, 0]) for this slightly-off-axis query
        assert [r["vec_id"] for r in rows] == [4, 0, 1]

    def test_read_restores_column_config(self, spark, vectors, tmp_path):
        """The sidecar persists column/id_col, so read() works on
        indexes built over non-default column names without the caller
        re-supplying them (and the sidecar goes through the Hadoop
        filesystem, honoring the path's URI scheme)."""
        from datatest_spark.operators import IvfIndex, ivf_build, ivf_query

        renamed = vectors.withColumnRenamed("vec_id", "item").\
            withColumnRenamed("embedding", "vec")
        train = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
        index = ivf_build(renamed, column="vec", id_col="item",
                          n_cells=2, train_vectors=train)
        path = str(tmp_path / "ivf_renamed")
        index.write(path)
        back = IvfIndex.read(spark, path)
        assert back.column == "vec" and back.id_col == "item"
        rows = ivf_query(back, [1.0, 0.05, 0.0, 0.0], k=2, nprobe=1).collect()
        assert rows and rows[0]["item"] in (0, 4)


class TestBpe:
    """Corpus-fit BPE tokenizer (operators/bpe.py): classic-algorithm
    agreement, determinism, and the distributed fit/encode path."""

    CORPUS = ["low low low low low lower lower newest newest",
              "newest newest newest widest widest widest new"]

    def test_merges_match_textbook_on_classic_corpus(self):
        from collections import Counter

        from datatest_spark.operators.bpe import bpe_merges_from_counts

        wc = Counter()
        for line in self.CORPUS:
            wc.update(w for w in line.split(" ") if w)
        fast = bpe_merges_from_counts(sorted(wc.items()), 10,
                                      min_pair_count=2)
        # naive reference fit: full recount each step
        words = {w: tuple(w) + ("</w>",) for w in wc}
        naive = []
        for _ in range(10):
            stats = Counter()
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    stats[(syms[i], syms[i + 1])] += wc[w]
            if not stats:
                break
            (l, r), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
            if c < 2:
                break
            naive.append((l, r, c))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = tuple(out)
        assert fast == naive
        # the most frequent pair involves 'est</w>' or 'lo' family
        assert fast[0][2] >= fast[-1][2]

    def test_encode_word_uses_rank_order(self):
        from datatest_spark.operators.bpe import bpe_encode_word

        # ranks: merge ('l','o') first, then ('lo','w')
        ranks = {("l", "o"): 0, ("lo", "w"): 1, ("w", "e"): 2}
        assert bpe_encode_word("low", ranks) == ["low", "</w>"]
        # unseen word falls back to chars + EOW
        assert bpe_encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]
        # all occurrences merge in one sweep
        assert bpe_encode_word("lolo", {("l", "o"): 0}) == \
            ["lo", "lo", "</w>"]

    def test_train_and_encode_distributed(self, spark):
        from datatest_spark.operators.bpe import (EOW, bpe_encode,
                                                  bpe_encode_word,
                                                  bpe_train)

        df = spark.createDataFrame(
            [(i, line) for i, line in enumerate(self.CORPUS * 3)],
            "doc_id long, text string",
        )
        merges = bpe_train(df, "text", num_merges=8)
        rows = merges.orderBy("rank").collect()
        assert [r.rank for r in rows] == list(range(len(rows)))
        assert all(r.pair_count >= 2 for r in rows)
        enc = bpe_encode(df, merges, "text").collect()
        ranks = {(r.left, r.right): r.rank for r in rows}
        for r in enc:
            text = (self.CORPUS * 3)[r.doc_id]
            exp = []
            for w in text.split(" "):
                if w:
                    exp.extend(bpe_encode_word(w, ranks))
            assert list(r.tokens) == exp
            assert r.n_tokens == len(exp)
            # tokens reassemble to the original words
            joined = "".join(r.tokens).replace(EOW, " ").strip()
            assert joined == " ".join(w for w in text.split(" ") if w)

    def test_vocab_cap_and_empty_corpus(self, spark):
        from datatest_spark.operators.bpe import bpe_train

        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        assert bpe_train(df, "text", num_merges=5).count() == 0
        df2 = spark.createDataFrame(
            [(i, "aa bb aa") for i in range(4)], "doc_id long, text string")
        # cap=1 keeps only the most frequent word type ('aa', count 8)
        capped = bpe_train(df2, "text", num_merges=5, vocab_cap=1)
        got = {(r.left, r.right) for r in capped.collect()}
        # tie at count 8 between ('a','</w>') and ('a','a'): lexicographic
        # tie-break takes ('a','</w>') first, then ('a','a</w>')
        assert got == {("a", "</w>"), ("a", "a</w>")}
