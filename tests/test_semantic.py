"""semantic_dedup / kmeans_assign vs a pure-numpy SemDeDup reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datatest_spark.operators.semantic import (
    kmeans_assign,
    semantic_dedup,
    semantic_dedup_recall,
)


def make_corpus(seed=7, n=120, d=16, n_dups=25):
    """Random unit-ish vectors plus planted near-duplicates (a scaled
    copy of an earlier vector with tiny noise → cosine ~0.999)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    for i in range(n - n_dups, n):
        src = int(rng.integers(0, n - n_dups))
        X[i] = X[src] * 1.7 + rng.normal(size=d) * 0.01
    q = rng.uniform(0.0, 1.0, size=n)
    return X, q


def ref_assign(X, cmat):
    nx = np.maximum(np.linalg.norm(X, axis=1), 1e-12)
    nc = np.maximum(np.linalg.norm(cmat, axis=1), 1e-12)
    return np.argmax((X @ cmat.T) / (nx[:, None] * nc[None, :]), axis=1)


def ref_semdedup(X, threshold, n_clusters, order_key):
    """Reference: anchor assignment, then within-cluster earliest-
    dominator rule over `order_key` order."""
    cmat = X[:n_clusters]
    assign = ref_assign(X, cmat)
    norms = np.maximum(np.linalg.norm(X, axis=1), 1e-12)
    out = {}
    for c in range(n_clusters):
        members = sorted(np.nonzero(assign == c)[0], key=order_key)
        for pos, i in enumerate(members):
            dup = None
            for j in members[:pos]:
                cs = float(X[i] @ X[j]) / (norms[i] * norms[j])
                if cs >= threshold:
                    dup = (j, cs)
                    break
            out[i] = (c, dup)
    return out


def to_df(spark, X, q=None, parts=5):
    rows = [
        (int(i), [float(v) for v in X[i]])
        + ((float(q[i]),) if q is not None else ())
        for i in range(len(X))
    ]
    schema = "vec_id long, embedding array<double>" + (
        ", quality double" if q is not None else "")
    return spark.createDataFrame(rows, schema).repartition(parts)


class TestSemanticDedup:
    def test_matches_numpy_reference_min_id(self, spark):
        X, _ = make_corpus()
        df = to_df(spark, X)
        got = {
            r["vec_id"]: r
            for r in semantic_dedup(df, "embedding", id_col="vec_id",
                                    n_clusters=6, threshold=0.9).collect()
        }
        want = ref_semdedup(X, 0.9, 6, order_key=lambda i: i)
        assert set(got) == set(range(len(X)))
        n_dups = 0
        for i, (c, dup) in want.items():
            r = got[i]
            assert r["cluster_id"] == c, f"row {i} cluster"
            assert r["is_dup"] == (dup is not None), f"row {i} is_dup"
            if dup is not None:
                n_dups += 1
                assert r["dup_of"] == dup[0], f"row {i} dup_of"
                assert r["sim_r"] == pytest.approx(dup[1], abs=1e-4)
            else:
                assert r["dup_of"] is None and r["sim_r"] is None
        assert n_dups >= 10  # the planted dups are actually exercised

    def test_keep_quality_keeps_best(self, spark):
        X, q = make_corpus()
        df = to_df(spark, X, q)
        got = {
            r["vec_id"]: r
            for r in semantic_dedup(df, "embedding", id_col="vec_id",
                                    n_clusters=6, threshold=0.9,
                                    keep="quality",
                                    quality_col="quality").collect()
        }
        want = ref_semdedup(X, 0.9, 6, order_key=lambda i: (-q[i], i))
        for i, (c, dup) in want.items():
            assert got[i]["is_dup"] == (dup is not None), f"row {i}"
            if dup is not None:
                assert got[i]["dup_of"] == dup[0], f"row {i} dup_of"
        # every duplicate points at a strictly better-or-equal keeper
        for i, r in got.items():
            if r["is_dup"]:
                j = r["dup_of"]
                assert (q[j], -j) > (q[i], -i) or q[j] == q[i]

    def test_partitioning_invariance(self, spark):
        X, _ = make_corpus(seed=11)
        a = semantic_dedup(to_df(spark, X, parts=2), "embedding",
                           id_col="vec_id", n_clusters=4,
                           threshold=0.9).collect()
        b = semantic_dedup(to_df(spark, X, parts=13), "embedding",
                           id_col="vec_id", n_clusters=4,
                           threshold=0.9).collect()
        key = lambda r: r["vec_id"]
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_string_ids(self, spark):
        X, _ = make_corpus(seed=13, n=60, n_dups=15)
        rows = [(f"doc-{i:04d}", [float(v) for v in X[i]])
                for i in range(len(X))]
        df = spark.createDataFrame(
            rows, "doc_id string, embedding array<double>").repartition(3)
        got = {r["doc_id"]: r
               for r in semantic_dedup(df, "embedding", id_col="doc_id",
                                       n_clusters=4,
                                       threshold=0.9).collect()}
        want = ref_semdedup(X, 0.9, 4, order_key=lambda i: i)
        assert len(got) == len(X)
        for i, (c, dup) in want.items():
            r = got[f"doc-{i:04d}"]
            assert r["cluster_id"] == c and r["is_dup"] == (dup is not None)
            if dup is not None:
                assert r["dup_of"] == f"doc-{dup[0]:04d}"

    def test_max_cluster_size_raises(self, spark):
        X, _ = make_corpus()
        with pytest.raises(Exception, match="max_cluster_size"):
            semantic_dedup(to_df(spark, X), "embedding", id_col="vec_id",
                           n_clusters=2, threshold=0.9,
                           max_cluster_size=10).collect()

    def test_bad_keep_rejected(self, spark):
        X, _ = make_corpus()
        df = to_df(spark, X)
        with pytest.raises(ValueError, match="keep"):
            semantic_dedup(df, "embedding", keep="random")
        with pytest.raises(ValueError, match="quality_col"):
            semantic_dedup(df, "embedding", keep="quality")


class TestSemanticRecall:
    def test_recall_bounds_and_exact_k1(self, spark):
        X, _ = make_corpus(seed=17)
        got = {r["n_clusters"]: r
               for r in semantic_dedup_recall(
                   to_df(spark, X), "embedding", id_col="vec_id",
                   threshold=0.9, n_clusters_list=(1, 3, 6)).collect()}
        assert got[1]["recall"] == 1.0  # k=1 IS the exact rule
        n_exact = got[1]["n_exact"]
        assert n_exact > 0
        for k in (3, 6):
            r = got[k]
            assert r["n_exact"] == n_exact
            assert 0 <= r["n_found"] <= n_exact  # bucketing only misses
            assert r["recall"] == pytest.approx(r["n_found"] / n_exact)


class TestKmeansAssign:
    def test_anchor_assignment_matches_numpy(self, spark):
        X, _ = make_corpus(seed=3)
        got = {r["vec_id"]: r["cluster_id"]
               for r in kmeans_assign(to_df(spark, X), "embedding",
                                      id_col="vec_id",
                                      n_clusters=5).collect()}
        want = ref_assign(X, X[:5])
        assert got == {i: int(want[i]) for i in range(len(X))}

    def test_lloyd_matches_numpy_lloyd(self, spark):
        X, _ = make_corpus(seed=5)
        got = {r["vec_id"]: r["cluster_id"]
               for r in kmeans_assign(to_df(spark, X), "embedding",
                                      id_col="vec_id", n_clusters=4,
                                      lloyd_iters=3).collect()}
        # reference Lloyd: mean update, empty cluster keeps centroid
        cmat = X[:4].copy()
        for _ in range(3):
            a = ref_assign(X, cmat)
            for c in range(4):
                if (a == c).any():
                    cmat[c] = X[a == c].mean(axis=0)
        want = ref_assign(X, cmat)
        assert got == {i: int(want[i]) for i in range(len(X))}

    def test_lloyd_reduces_inertia(self, spark):
        X, _ = make_corpus(seed=9, n=200)

        def inertia(labels):
            tot = 0.0
            nx = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            for c in set(labels.values()):
                m = np.array([nx[i] for i, l in labels.items() if l == c])
                tot += float(((m - m.mean(axis=0)) ** 2).sum())
            return tot

        lab0 = {r["vec_id"]: r["cluster_id"]
                for r in kmeans_assign(to_df(spark, X), "embedding",
                                       id_col="vec_id",
                                       n_clusters=6).collect()}
        lab3 = {r["vec_id"]: r["cluster_id"]
                for r in kmeans_assign(to_df(spark, X), "embedding",
                                       id_col="vec_id", n_clusters=6,
                                       lloyd_iters=3).collect()}
        assert inertia(lab3) <= inertia(lab0) + 1e-9

    def test_too_few_rows_raises(self, spark):
        df = to_df(spark, np.eye(3))
        with pytest.raises(ValueError, match="n_clusters"):
            kmeans_assign(df, "embedding", id_col="vec_id", n_clusters=8)


class TestPlanShape:
    def test_no_row_at_a_time_python(self, spark):
        X, _ = make_corpus()
        out = semantic_dedup(to_df(spark, X), "embedding",
                             id_col="vec_id", n_clusters=4, threshold=0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        # the quadratic stage is a single grouped-map (FlatMapGroupsInPandas)
        assert "FlatMapGroupsInPandas" in plan
