"""Similarity search over embedding columns.

* :func:`cosine_scores` — brute-force cosine vs a query vector, the
  exact baseline.  One projection (zip_with + aggregate, all JVM-side),
  one filter; trivially parallel, no shuffle.
* :func:`topk_neighbors` — exact top-k via the same projection + a
  bounded sort (``orderBy ... limit k`` → Spark TakeOrdered, no global
  sort materialization).
* :func:`ivf_topk` — the scale path: k-means-lite coarse quantizer
  (seeded sample, driver-side centroid refinement over a tiny sample)
  assigns each vector to its nearest centroid JVM-side; queries probe
  only the closest ``nprobe`` cells.  At 10^12 rows the probe prunes
  the scan to cells/nprobe of the table (with cell-partitioned storage
  this becomes partition pruning).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import CacheHandle, evict_all

__all__ = ["cosine_scores", "topk_neighbors", "ivf_topk",
           "IvfIndex", "ivf_build", "ivf_query", "knn_join",
           "ivf_knn_join", "knn_join_distributed", "ivf_recall",
           "unpersist_cached"]

# per-call CacheHandle attached to the returned frame (same lifecycle
# contract as operators.dedup): intermediates stay persisted until the
# caller materializes or drops the result.
_HANDLES: list = []


def unpersist_cached(blocking: bool = False) -> int:
    """Evict every persisted intermediate this module still tracks."""
    return evict_all(_HANDLES, blocking)


def _hadoop_path(spark, base: str, name: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(base, name)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def _hadoop_write_text(spark, base: str, name: str, text: str) -> None:
    """Write a small text file via the JVM Hadoop filesystem so the
    path scheme (file:/, hdfs://, s3a://...) is honored — local
    ``open()`` would silently break index persistence on object
    stores."""
    fs, p = _hadoop_path(spark, base, name)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _hadoop_read_text(spark, base: str, name: str) -> str:
    fs, p = _hadoop_path(spark, base, name)
    stream = fs.open(p)
    try:
        # byte-array buffers don't round-trip through py4j (the Java
        # side fills a copy), so drain the stream JVM-side
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x.cast("array<double>"), y.cast("array<double>"),
                   lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine_vs_literal(col: Column, qv: Sequence[float]) -> Column:
    q = F.array(*[F.lit(float(v)) for v in qv])
    qnorm = float(np.sqrt(np.dot(qv, qv)))
    return _dot(col, q) / (F.sqrt(_dot(col, col)) * F.lit(qnorm))


def _query_vector(df: DataFrame, column: str, id_col: str, query_id) -> List[float]:
    row = df.filter(F.col(id_col) == query_id).select(column).first()
    if row is None:
        raise ValueError(f"query id {query_id!r} not found")
    return [float(v) for v in row[0]]


def cosine_scores(df: DataFrame, column: str = "embedding",
                  id_col: str = "vec_id", query_id=0,
                  min_score: float = 0.25) -> DataFrame:
    """All vectors with rounded cosine ≥ min_score vs the query vector."""
    qv = _query_vector(df, column, id_col, query_id)
    cs = F.round(_cosine_vs_literal(F.col(column), qv), 4)
    return df.select(F.col(id_col), cs.alias("cs_r")).filter(
        F.col("cs_r") >= min_score
    )


def topk_neighbors(df: DataFrame, query_vector: Sequence[float], k: int = 10,
                   column: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine (TakeOrdered — no full sort)."""
    cs = _cosine_vs_literal(F.col(column), list(query_vector))
    return (
        df.select(F.col(id_col), F.round(cs, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _train_centroids(sample: np.ndarray, n_cells: int, iters: int = 5,
                     seed: int = 42) -> np.ndarray:
    """Tiny k-means on a driver-side sample (IVF coarse quantizer)."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    centroids = sample[idx].copy()
    for _ in range(iters):
        # cosine assignment on normalized vectors
        norms = np.linalg.norm(sample, axis=1, keepdims=True)
        norms[norms == 0] = 1
        sn = sample / norms
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        assign = np.argmax(sn @ cn.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_topk(df: DataFrame, query_vector: Sequence[float], k: int = 10,
             column: str = "embedding", id_col: str = "vec_id",
             n_cells: int = 16, nprobe: int = 4,
             sample_rows: int = 10_000, seed: int = 42,
             approx_count: Optional[int] = None,
             train_vectors: Optional[Sequence[Sequence[float]]] = None
             ) -> DataFrame:
    """IVF-style ANN: train a coarse quantizer on a seeded sample,
    assign vectors to cells JVM-side, search only the ``nprobe`` cells
    nearest the query.  Returns (id, cosine) — approximate top-k.

    ``approx_count``: pass a (rough — ±50% is fine) row-count estimate
    to size the Bernoulli training fraction without the counting scan.
    At index-build scale the count is usually already known (table
    stats, a prior pipeline stage); when omitted, a ``count()`` job
    runs first — Catalyst prunes it to a zero-column scan, so it reads
    no embedding data, but it is still an extra pass over the plan.

    ``train_vectors``: explicit quantizer training set.  When given,
    no sampling scan runs at all and the index is fully reproducible
    from inputs (Spark's internal per-partition sample RNG is not) —
    use this for production index builds that must be replayable.

    Single-shot convenience over :func:`ivf_build` + :func:`ivf_query`
    — repeated queries should build (and usually :meth:`IvfIndex.write`)
    once instead.
    """
    index = ivf_build(
        df, column=column, id_col=id_col, n_cells=n_cells,
        sample_rows=sample_rows, seed=seed, approx_count=approx_count,
        train_vectors=train_vectors,
    )
    return ivf_query(index, query_vector, k=k, nprobe=nprobe)


class IvfIndex:
    """A built IVF index: quantizer centroids (driver-side, tiny) +
    the cell-assigned vector table (distributed).

    Build once, query many — the production shape ``ivf_topk`` (a
    single-shot convenience) composes.  ``write``/``read`` persist the
    assignment partitioned **by cell**, so each query's ``nprobe``
    cells become parquet partition pruning: a 16,384-cell / nprobe=32
    index reads ~0.2% of the table per query, no index service needed.
    """

    def __init__(self, centroids: np.ndarray, assigned: DataFrame,
                 column: str, id_col: str):
        self.centroids = np.asarray(centroids, dtype=float)
        self.assigned = assigned
        self.column = column
        self.id_col = id_col

    def write(self, path: str, mode: str = "overwrite") -> None:
        """Persist the assignment partitioned by cell (+ centroids and
        column config as a tiny JSON sidecar) — queries against the
        read-back index are partition-pruned to the probed cells.

        The sidecar goes through the JVM Hadoop filesystem of *path*,
        so the index round-trips on any supported URI (s3a://,
        hdfs://, file:/...), not just the local disk; the leading
        underscore keeps Spark's parquet reader from treating it as
        data (same convention as ``_SUCCESS``)."""
        import json

        self.assigned.write.mode(mode).partitionBy("cell").parquet(path)
        payload = json.dumps(
            {
                "centroids": self.centroids.tolist(),
                "column": self.column,
                "id_col": self.id_col,
            }
        )
        spark = self.assigned.sparkSession
        _hadoop_write_text(spark, path, "_ivf_centroids.json", payload)

    @classmethod
    def read(cls, spark, path: str, column: Optional[str] = None,
             id_col: Optional[str] = None) -> "IvfIndex":
        """Load a written index.  ``column``/``id_col`` default to the
        values persisted at build time (overridable for indexes written
        by the pre-sidecar format, whose sidecar is a bare list)."""
        import json

        meta = json.loads(_hadoop_read_text(spark, path, "_ivf_centroids.json"))
        if isinstance(meta, list):  # legacy sidecar: centroids only
            meta = {"centroids": meta}
        centroids = np.asarray(meta["centroids"], dtype=float)
        assigned = spark.read.parquet(path).withColumn(
            "cell", F.col("cell").cast("int")
        )
        return cls(
            centroids,
            assigned,
            column or meta.get("column", "embedding"),
            id_col or meta.get("id_col", "vec_id"),
        )


def ivf_build(df: DataFrame, column: str = "embedding",
              id_col: str = "vec_id", n_cells: int = 16,
              sample_rows: int = 10_000, seed: int = 42,
              approx_count: Optional[int] = None,
              train_vectors: Optional[Sequence[Sequence[float]]] = None
              ) -> IvfIndex:
    """Train the coarse quantizer and assign every vector to its cell
    (JVM-side argmax — one projection, no shuffle).  See
    :func:`ivf_topk` for the sampling/`train_vectors` contract."""
    if train_vectors is not None:
        sample = np.array(
            [[float(v) for v in row] for row in train_vectors], dtype=float
        )
    else:
        total = approx_count if approx_count is not None else df.count()
        frac = min(1.0, (3.0 * sample_rows) / max(total, 1))
        sample = np.array(
            [
                [float(v) for v in r[0]]
                for r in df.select(column)
                .sample(fraction=frac, seed=seed)
                .limit(sample_rows)
                .collect()
            ]
        )
    if len(sample) == 0:
        raise ValueError("ivf_build: empty input")
    centroids = _train_centroids(sample, n_cells, seed=seed)

    cells = []
    for ci, cvec in enumerate(centroids):
        cn = cvec / max(float(np.linalg.norm(cvec)), 1e-12)
        cells.append(
            F.struct(
                (_dot(F.col(column), F.array(*[F.lit(float(v)) for v in cn]))
                 / F.sqrt(_dot(F.col(column), F.col(column))))
                .alias("score"),
                F.lit(ci).alias("cell"),
            )
        )
    assigned = df.select(
        F.col(id_col), F.col(column),
        F.array_max(F.array(*cells))["cell"].alias("cell"),
    )
    return IvfIndex(centroids, assigned, column, id_col)


def knn_join(corpus: DataFrame, queries: DataFrame, k: int = 10,
             column: str = "embedding", id_col: str = "vec_id",
             query_id_col: Optional[str] = None,
             query_column: Optional[str] = None,
             max_queries: int = 10_000) -> DataFrame:
    """Batch k-nearest-neighbors: for EVERY query row, the exact top-k
    corpus rows by cosine → ``(query_id, neighbor_id, cosine)``.

    Plan shape (the classic two-stage distributed top-k):

    1. The (bounded — ``max_queries``) query set is collected once and
       closed over as a normalized numpy matrix — the broadcast side.
    2. ``mapInPandas`` over the corpus: per Arrow batch, ONE matrix
       product scores every (row, query) pair — vectorized float64
       BLAS, the fast path for dense embedding math (a per-pair
       ``F.aggregate`` zip-fold re-walks the arrays per query) — and
       only each query's LOCAL top-k survives the stage, so the
       shuffle carries ≤ k·Q rows per batch, never |corpus|·Q.
    3. A window per query_id keeps the global top-k of the local
       winners.

    Scores are rounded to 6 decimals BEFORE ranking (ties broken by
    neighbor id) so the result is reproducible across partitionings
    and summation orders; the division uses the textbook
    ``dot/(|a||b|)`` association for oracle parity.

    Reference analogue: datatest has no similarity search; this is the
    scale-path generalization of `RequiredApprox` nearest-reference
    matching to embedding space (SURVEY §2 training-data additions).
    """
    query_id_col = query_id_col or id_col
    query_column = query_column or column

    q_rows = queries.select(query_id_col, query_column).limit(
        max_queries + 1
    ).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"knn_join: > {max_queries} query rows; for query sets this "
            "large build an IvfIndex and use knn_join_distributed, "
            "which assigns queries to cells with no driver collect"
        )
    if not q_rows:
        raise ValueError("knn_join: empty query set")
    qids = [r[0] for r in q_rows]
    qmat = np.array([[float(v) for v in r[1]] for r in q_rows], dtype=float)
    qnorm = np.maximum(np.linalg.norm(qmat, axis=1), 1e-12)

    id_field = corpus.schema[id_col]
    q_id_field = queries.schema[query_id_col]
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", q_id_field.dataType),
            T.StructField("neighbor_id", id_field.dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    import pandas as pd

    def local_topk(batches):
        # Accumulate the running top-k per query across ALL of this
        # partition's Arrow batches and emit ONCE at iterator end:
        # emitting per batch would ship k·Q rows per 256-row batch — a
        # k·Q/256-fold data expansion at scale.  This way each
        # partition contributes exactly ≤ k·Q rows to the final window.
        best = [None] * len(qids)  # per query: (scores, ids)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf[column].tolist(), dtype=float)
            mnorm = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
            scores = np.round(
                (mat @ qmat.T) / np.outer(mnorm, qnorm), 6
            )
            ids = pdf[id_col].to_numpy()
            for j in range(len(qids)):
                cs, ci = scores[:, j], ids
                if best[j] is not None:
                    cs = np.concatenate([best[j][0], cs])
                    ci = np.concatenate([best[j][1], ci])
                order = np.lexsort((ci, -cs))[:k]
                best[j] = (cs[order], ci[order])
        outs = []
        for j, qid in enumerate(qids):
            if best[j] is None:
                continue
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": [qid] * len(best[j][1]),
                        "neighbor_id": best[j][1],
                        "cosine": best[j][0],
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    from pyspark.sql import Window

    local = corpus.select(id_col, column).mapInPandas(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_knn_join(index: IvfIndex, queries: DataFrame, k: int = 10,
                 nprobe: int = 4, query_id_col: Optional[str] = None,
                 query_column: Optional[str] = None,
                 max_queries: int = 10_000) -> DataFrame:
    """IVF-accelerated batch kNN: each query scores ONLY corpus rows in
    its ``nprobe`` nearest cells — the scale path of :func:`knn_join`.

    Each corpus row is touched once (one pass over the cell-assigned
    table); inside the vectorized stage a row is scored only against
    the queries probing its cell, so compute drops from ``|corpus|·Q``
    to ``~|corpus|·Q·nprobe/n_cells``.  Against an index **written**
    partitioned by cell, pre-filtering to the union of probed cells
    additionally prunes the parquet scan to the probed files (the
    ``ivf_query`` PartitionFilters property, batched).

    With ``nprobe >= n_cells`` every cell is probed and the result is
    exactly :func:`knn_join`'s (the oracle certifies that equivalence);
    smaller ``nprobe`` trades recall for the pruned scan, as usual for
    IVF.
    """
    query_id_col = query_id_col or index.id_col
    query_column = query_column or index.column

    q_rows = queries.select(query_id_col, query_column).limit(
        max_queries + 1
    ).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"ivf_knn_join: > {max_queries} query rows; use "
            "knn_join_distributed, which routes queries to cells with "
            "no driver collect and no query-count bound"
        )
    if not q_rows:
        raise ValueError("ivf_knn_join: empty query set")
    qids = [r[0] for r in q_rows]
    qmat = np.array([[float(v) for v in r[1]] for r in q_rows], dtype=float)
    qnorm = np.maximum(np.linalg.norm(qmat, axis=1), 1e-12)

    cn = index.centroids / np.maximum(
        np.linalg.norm(index.centroids, axis=1, keepdims=True), 1e-12
    )
    nprobe = min(nprobe, len(index.centroids))
    # per-query probe cells (driver-side: Q x n_cells, tiny), inverted
    # to cell -> [query indexes] for the per-batch scoring
    probe = np.argsort(-((qmat / qnorm[:, None]) @ cn.T), axis=1)[:, :nprobe]
    cell_queries: dict = {}
    for qi, cells in enumerate(probe):
        for c in cells:
            cell_queries.setdefault(int(c), []).append(qi)
    probed_cells = sorted(cell_queries)

    id_col, column = index.id_col, index.column
    q_id_field = queries.schema[query_id_col]
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", q_id_field.dataType),
            T.StructField("neighbor_id", index.assigned.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    import pandas as pd

    def local_topk(batches):
        # running top-k per query across the whole partition — see
        # knn_join: per-batch emission would expand the data k·Q-fold
        best: dict = {}  # query index -> (scores, ids)
        for pdf in batches:
            if not len(pdf):
                continue
            for cell, grp in pdf.groupby("cell"):
                qidx = cell_queries.get(int(cell))
                if not qidx:
                    continue
                mat = np.array(grp[column].tolist(), dtype=float)
                mnorm = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
                sub_q = qmat[qidx]
                sub_n = qnorm[qidx]
                scores = np.round(
                    (mat @ sub_q.T) / np.outer(mnorm, sub_n), 6
                )
                ids = grp[id_col].to_numpy()
                for j, qi in enumerate(qidx):
                    cs, ci = scores[:, j], ids
                    if qi in best:
                        cs = np.concatenate([best[qi][0], cs])
                        ci = np.concatenate([best[qi][1], ci])
                    order = np.lexsort((ci, -cs))[:k]
                    best[qi] = (cs[order], ci[order])
        outs = []
        for qi, (cs, ci) in best.items():
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": [qids[qi]] * len(ci),
                        "neighbor_id": ci,
                        "cosine": cs,
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    from pyspark.sql import Window

    pruned = index.assigned.filter(F.col("cell").isin(probed_cells))
    local = pruned.select(id_col, column, "cell").mapInPandas(
        local_topk, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_join_distributed(index: IvfIndex, queries: DataFrame, k: int = 10,
                         nprobe: int = 4,
                         query_id_col: Optional[str] = None,
                         query_column: Optional[str] = None) -> DataFrame:
    """Batch kNN for UNBOUNDED query sets — the scale path past
    :func:`knn_join`'s ``max_queries`` broadcast bound.  No driver
    collect anywhere: queries are assigned to their ``nprobe`` nearest
    cells with JVM expressions (the same centroid-scoring shape
    :func:`ivf_build` uses for the corpus), then corpus and queries
    **cogroup by cell** and each cell scores its members against only
    the queries probing it — one Arrow-batched BLAS product per cell,
    a per-query local top-k out of the Python stage, and a final
    window keeps the global top-k across each query's probed cells.

    Cost: ``~|corpus|·|Q|·nprobe/n_cells`` multiply-adds spread over
    the cells, with shuffles keyed on the (int) cell id.  A cell's
    corpus+probe rows are held in one pandas frame while it scores, so
    size ``n_cells`` such that ``|corpus|/n_cells`` rows of embeddings
    fit an executor (the same sizing rule as the IVF index itself);
    the cell-id shuffle is subject to AQE skew splitting only between
    cells, so a single dominant cell should be fixed at build time
    (more cells), not at query time.

    With ``nprobe >= n_cells`` the result is exactly
    :func:`knn_join`'s (identical rounding and tie-break — the oracle
    certifies the equivalence); smaller ``nprobe`` trades recall for
    pruned compute, as usual for IVF.
    """
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    query_id_col = query_id_col or index.id_col
    query_column = query_column or index.column
    id_col, column = index.id_col, index.column
    n_cells = len(index.centroids)
    nprobe = min(int(nprobe), n_cells)
    cn = index.centroids / np.maximum(
        np.linalg.norm(index.centroids, axis=1, keepdims=True), 1e-12
    )

    # per-query probe cells, all JVM expressions: score each centroid,
    # sort the (score, cell) structs, keep the nprobe best, explode
    qcol = F.col(query_column)
    qnorm = F.sqrt(_dot(qcol, qcol))
    cells = [
        F.struct(
            (_dot(qcol, F.array(*[F.lit(float(v)) for v in cvec])) / qnorm)
            .alias("score"),
            F.lit(ci).alias("cell"),
        )
        for ci, cvec in enumerate(cn)
    ]
    probes = F.slice(F.reverse(F.array_sort(F.array(*cells))), 1, nprobe)
    probed = queries.select(
        F.col(query_id_col).alias("query_id"),
        qcol.cast("array<double>").alias("__qv"),
        F.explode(F.transform(probes, lambda s: s["cell"])).alias("cell"),
    )

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id_col].dataType),
            T.StructField("neighbor_id",
                          index.assigned.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def cell_topk(corpus_pdf: pd.DataFrame,
                  probe_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(corpus_pdf) or not len(probe_pdf):
            return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                 "cosine": []})
        mat = np.array(corpus_pdf[column].tolist(), dtype=float)
        mnorm = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        qmat = np.array(probe_pdf["__qv"].tolist(), dtype=float)
        qn = np.maximum(np.linalg.norm(qmat, axis=1), 1e-12)
        scores = np.round((mat @ qmat.T) / np.outer(mnorm, qn), 6)
        ids = corpus_pdf[id_col].to_numpy()
        qids = probe_pdf["query_id"].to_numpy()
        outs = []
        for j in range(len(qids)):
            order = np.lexsort((ids, -scores[:, j]))[:k]
            outs.append(pd.DataFrame({
                "query_id": [qids[j]] * len(order),
                "neighbor_id": ids[order],
                "cosine": scores[order, j],
            }))
        return pd.concat(outs, ignore_index=True)

    corpus = index.assigned.select(id_col, column, "cell")
    local = corpus.groupby("cell").cogroup(
        probed.groupby("cell")
    ).applyInPandas(cell_topk, out_schema)

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_recall(index: IvfIndex, queries: DataFrame, k: int = 10,
               nprobes: Sequence[int] = (1, 2, 4),
               query_id_col: Optional[str] = None,
               query_column: Optional[str] = None) -> DataFrame:
    """Measured recall@k of the pruned IVF probe path, per nprobe —
    evidence (not an assertion) of what ``nprobe < n_cells`` costs.

    Runs :func:`knn_join_distributed` once at ``nprobe = n_cells``
    (exact: every cell probed) and once per entry of ``nprobes``; an
    inner join on ``(query_id, neighbor_id)`` counts, for each query,
    how many exact top-k neighbors the pruned run recovered.  A
    query's recall is ``hits / |exact top-k|`` (denominator < k only
    when the corpus itself has fewer than k rows).  Output is one row
    per probed setting — ``(nprobe, n_queries, mean_recall,
    min_recall)`` — tiny and safe to collect.

    The exact frame is persisted once and shared across all pruned
    runs (per-call :class:`CacheHandle` lifecycle, freed when the
    returned frame is materialized and dropped); every join is keyed
    on ``(query_id, neighbor_id)``, so the measurement scales exactly
    as far as the underlying kNN join does — no driver collect, no
    per-query loop.
    """
    n_cells = len(index.centroids)
    handle = CacheHandle(_HANDLES)
    exact = handle.register(
        knn_join_distributed(index, queries, k=k, nprobe=n_cells,
                             query_id_col=query_id_col,
                             query_column=query_column)
        .select("query_id", "neighbor_id")
        .persist()
    )
    per_query_exact = exact.groupBy("query_id").agg(
        F.count("*").alias("n_exact"))

    out = None
    for p in nprobes:
        approx = knn_join_distributed(
            index, queries, k=k, nprobe=int(p),
            query_id_col=query_id_col, query_column=query_column,
        ).select("query_id", "neighbor_id")
        hits = (
            exact.join(approx, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count("*").alias("n_hit"))
        )
        per_q = per_query_exact.join(hits, "query_id", "left").select(
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"))
            .alias("recall")
        )
        row = per_q.agg(
            F.count("*").alias("n_queries"),
            F.round(F.avg("recall"), 6).alias("mean_recall"),
            F.round(F.min("recall"), 6).alias("min_recall"),
        ).select(F.lit(int(p)).alias("nprobe"), "*")
        out = row if out is None else out.unionByName(row)
    return handle.attach(out)


def ivf_query(index: IvfIndex, query_vector: Sequence[float], k: int = 10,
              nprobe: int = 4) -> DataFrame:
    """Approximate top-k against a built index: rank cells by centroid
    similarity, scan only the ``nprobe`` best (partition-pruned when
    the index was written partitioned by cell)."""
    q = np.asarray(list(query_vector), dtype=float)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    cn = index.centroids / np.maximum(
        np.linalg.norm(index.centroids, axis=1, keepdims=True), 1e-12
    )
    probe = np.argsort(-(cn @ qn))[:nprobe].tolist()
    cs = _cosine_vs_literal(F.col(index.column), list(query_vector))
    return (
        index.assigned.filter(F.col("cell").isin(probe))
        .select(F.col(index.id_col), F.round(cs, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(index.id_col))
        .limit(k)
    )
