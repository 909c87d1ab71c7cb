"""IVF (inverted-file) approximate nearest-neighbor search over embeddings.

The third ANN path next to ``ann.brute_force_topk`` (exact, reads the corpus
once per query batch) and ``ann.lsh_topk`` (data-independent hyperplane
buckets): IVF partitions the corpus into ``num_cells`` Voronoi cells around
trained centroids and probes only the ``nprobe`` cells nearest each query —
the classic candidates ≪ corpus trade dial (recall vs cost) when queries are
many and the corpus is clustered. The reference engine has no ANN at all
(SURVEY.md §2.5); this is a beyond-reference pipeline component.

Scale shape:

* centroid TRAINING is bounded at any corpus size: a deterministic
  ``max_train_rows`` sample (per-partition top-n merge, never a full sort)
  feeds a seeded driver-side spherical k-means — centroids are few by
  definition, exactly the carve-out ``brute_force_topk`` uses for queries;
* cell ASSIGNMENT is one distributed pass: broadcast the (num_cells × dim)
  centroid matrix, one vectorized numpy matmul + argmax per Arrow batch
  (``method="numpy"``, the production path);
* the PROBE is an equi-join on the cell id — corpus cell lists shuffle once
  by cell, candidates rerank with exact cosine, a per-query window takes
  top-k. Nothing is quadratic; no driver collection beyond queries/centroids.

``method="expr"`` assigns cells with JVM expressions whose float64 operation
order is reproducible verbatim in DuckDB SQL (sequential dot products, not
numpy's blocked matmul) — the cross-engine-verification path used by the
driver oracle; pytest asserts both methods agree on the fixtures. Likewise
``centroids="sample"`` picks centroids by a data-deterministic SQL-replicable
rule (first ``num_cells`` corpus rows in md5(id) order) so the END-TO-END
IVF result is oracle-checkable, while ``centroids="kmeans"`` is the quality
path (deterministic too, but iterative — not expressible in one SQL query).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.cache import tracked_cache as _tc


def _dot_col(u, w):
    """Sequential float64 dot product as a JVM expression — identical
    operation order to DuckDB's list_transform + list_aggregate('sum')."""
    return F.aggregate(
        F.zip_with(u, w, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_col(u):
    return F.sqrt(
        F.aggregate(
            F.transform(u, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _md5_order_sample(corpus: DataFrame, id_col: str, vec_col: str, n: int):
    """First ``n`` rows in md5(CAST(id AS STRING)) order — a deterministic
    pseudo-random sample both engines order identically, fetched as a
    per-partition top-n + driver merge (TakeOrdered), never a full sort."""
    return (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n)
        .collect()
    )


def sample_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, num_cells: int
) -> np.ndarray:
    """(num_cells × dim) float64 centroids = the corpus vectors of the first
    ``num_cells`` rows in md5(id) order. Cell i is the i-th such row — the
    rule a SQL oracle reproduces verbatim (row_number over the same order)."""
    rows = _md5_order_sample(corpus, id_col, vec_col, num_cells)
    if not rows:
        raise ValueError("empty corpus")
    return np.array([list(r[vec_col]) for r in rows], dtype=np.float64)


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    num_cells: int,
    max_train_rows: int = 100_000,
    iters: int = 20,
) -> np.ndarray:
    """Spherical k-means on a bounded deterministic sample (quality path).

    Init = the sample's first ``num_cells`` vectors (md5 order — no RNG, so
    retries/resumes train identical centroids). Fixed ``iters`` assign/update
    rounds in numpy on the driver: the sample is ≤ max_train_rows rows by
    construction, independent of corpus size. Empty cells keep their previous
    centroid. Returned centroids are L2-normalized (cosine argmax ≡ dot)."""
    rows = _md5_order_sample(corpus, id_col, vec_col, max_train_rows)
    if len(rows) < num_cells:
        raise ValueError(f"corpus smaller than num_cells={num_cells}")
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[:num_cells].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for i in range(num_cells):
            members = Xn[assign == i]
            if len(members):
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 1e-12:
                    C[i] = m / nrm
    return C


def assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    nprobe: int = 1,
    method: str = "numpy",
) -> DataFrame:
    """(id, cell) rows: each vector's ``nprobe`` nearest centroid cells by
    cosine (ties → lower cell id).

    ``method="numpy"`` — broadcast centroid matrix, one matmul + argpartition
    per Arrow batch (production). ``method="expr"`` — per-cell sequential-sum
    score expressions + a window rank, float64-op-order-identical to the
    DuckDB oracle (verification path; the window shuffles N×num_cells rows,
    fine at oracle scale, not meant for 10^12 rows)."""
    C = np.asarray(centroids, dtype=np.float64)
    ncells = C.shape[0]
    nprobe = min(nprobe, ncells)
    if method == "expr":
        scores = [
            (
                _dot_col(F.col(vec_col), F.array(*[F.lit(float(x)) for x in C[i]]))
                / (
                    _norm_col(F.col(vec_col))
                    * _norm_col(F.array(*[F.lit(float(x)) for x in C[i]]))
                )
            ).alias(f"_s{i}")
            for i in range(ncells)
        ]
        w = Window.partitionBy("id").orderBy(F.col("_s").desc(), F.col("cell").asc())
        return (
            df.select(F.col(id_col).alias("id"), *scores)
            .select(
                "id",
                F.posexplode(F.array(*[F.col(f"_s{i}") for i in range(ncells)])).alias(
                    "cell", "_s"
                ),
            )
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= nprobe)
            .select("id", "cell")
        )
    if method != "numpy":
        raise ValueError(f"unknown assignment method {method!r}")
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    spark = df.sparkSession
    bC = spark.sparkContext.broadcast(Cn)
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("cell", T.IntegerType())]
    )

    def fn(batches):
        import pandas as pd

        Cn_l = bC.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = Xn @ Cn_l.T  # (batch, ncells); norms drop out of the argmax
            if nprobe == 1:
                cells = np.argmax(S, axis=1)[:, None]
            else:
                # full stable sort, not argpartition: at the nprobe boundary
                # argpartition picks an arbitrary member of a tied score set,
                # which would diverge from the expr/SQL rule; a stable sort
                # on -S breaks every tie by lower cell id, matching
                # ORDER BY s DESC, cell ASC exactly (ncells is small, the
                # full sort is noise)
                cells = np.argsort(-S, axis=1, kind="stable")[:, :nprobe]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, nprobe),
                    "cell": cells.ravel().astype(np.int32),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(fn, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_cells: int = 64,
    nprobe: int = 4,
    centroids: np.ndarray | str = "kmeans",
    method: str = "numpy",
    max_train_rows: int = 100_000,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via IVF cells: (query_id, neighbor_id,
    cosine, rank). ``centroids`` is a precomputed (num_cells × dim) matrix,
    ``"kmeans"`` (bounded-sample spherical k-means) or ``"sample"``
    (md5-order sample rule — the SQL-oracle-replicable variant).
    ``nprobe == num_cells`` probes every cell → exactly ``brute_force_topk``'s
    result (tested)."""
    if isinstance(centroids, str):
        if centroids == "kmeans":
            C = kmeans_centroids(
                corpus, id_col, vec_col, num_cells, max_train_rows=max_train_rows
            )
        elif centroids == "sample":
            C = sample_centroids(corpus, id_col, vec_col, num_cells)
        else:
            raise ValueError(f"unknown centroid rule {centroids!r}")
    else:
        C = np.asarray(centroids, dtype=np.float64)

    corpus_cells = assign_cells(
        corpus, id_col, vec_col, C, nprobe=1, method=method
    ).withColumnRenamed("id", "neighbor_id").persist().transform(_tc)
    probe_cells = assign_cells(
        queries, id_col, vec_col, C, nprobe=nprobe, method=method
    ).withColumnRenamed("id", "query_id")

    cand = (
        probe_cells.join(corpus_cells, "cell")
        .select("query_id", "neighbor_id")
        .distinct()
    )
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("neighbor_id"))

    c_vec = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = (
        cand.join(q_vec, "query_id")
        .join(c_vec, "neighbor_id")
        .withColumn(
            "cosine",
            _dot_col(F.col("_qv"), F.col("_cv"))
            / (_norm_col(F.col("_qv")) * _norm_col(F.col("_cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
