"""SemDeDup — semantic (embedding-space) deduplication of a corpus.

Implements the cluster-then-prune rule of Abbas et al., "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication" (2023):
partition the embedding corpus into ``num_cells`` k-means/Voronoi cells,
rank the members of each cell, and DROP every item that has an
earlier-ranked cell-mate with cosine similarity ≥ ``threshold``. Unlike
exact/minhash dedup (operators/dedup.py) this removes *semantic*
near-duplicates — paraphrases, boilerplate re-renders, template clones —
that share no literal n-grams. Beyond-reference operator (the reference
engine joins on token sets only, SURVEY.md §2.5); the clustering half
reuses the IVF machinery (operators/ivf.py).

The paper's keep-rule is **rank-based, not greedy**: item x is removed iff
SOME earlier-ranked cell-mate y has cos(x, y) ≥ threshold — whether or not
y itself survived. That makes the rule order-independent given the ranking
(a pure EXISTS over pairs), hence fully parallel AND expressible in one SQL
query for the oracle. Two rankings:

* ``order_by="centroid"`` — the paper's: ascending cosine-to-assigned-
  centroid (the kept representative of a duplicate group is the member
  LEAST similar to the centroid, i.e. the most "outlying" exemplar),
  ties on id ascending;
* ``order_by="id"`` — ascending id (min-id representative), the simplest
  deterministic rule.

Scale shape (100 TB test): cell assignment is one broadcast-centroids
matmul pass (``ivf.assign_cells``); the within-cell pair scan shuffles the
corpus ONCE on the cell id and each task sees one cell — the O(|cell|²)
similarity work is inherent to the algorithm (the whole point of the
clustering is to bound it: num_cells ≈ N / target_cell_rows keeps every
task's Gram matrix constant-sized as N grows). Nothing is collected to the
driver except the (num_cells × dim) centroid matrix, which is bounded by
construction. Hot cells are the skew risk — size ``num_cells`` so the
expected cell is small and let AQE split stragglers; a cell too large for
one task means the clustering is too coarse for SemDeDup to be meaningful
anyway (candidates within a cell are supposed to be few and similar).

``method="pandas"`` (production): per-cell Arrow cogroup, chunked numpy
Gram matrix, vectorized earlier-duplicate test. ``method="expr"`` (oracle
parity): the within-cell self-join with sequential-fold JVM cosine
expressions whose float64 op order DuckDB reproduces verbatim — every
comparison (threshold, centroid-rank) is then bit-identical cross-engine.
pytest asserts both methods agree.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ivf import _dot_col, _norm_col, assign_cells, kmeans_centroids, sample_centroids


def _expr_assign_with_sim(
    corpus: DataFrame, id_col: str, vec_col: str, C: np.ndarray
) -> DataFrame:
    """(id, vec, cell, csim): each vector's nearest centroid by cosine
    (ties → lower cell id) plus the winning similarity, as JVM expressions
    with DuckDB-identical float64 op order (cf. ivf.assign_cells expr)."""
    ncells = C.shape[0]
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
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cell").asc())
    return (
        corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("_vec"), *scores
        )
        .select(
            "id",
            "_vec",
            F.posexplode(F.array(*[F.col(f"_s{i}") for i in range(ncells)])).alias(
                "cell", "csim"
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id", "_vec", "cell", "csim")
    )


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_cells: int = 1024,
    centroids: str | np.ndarray = "kmeans",
    method: str = "pandas",
    order_by: str = "centroid",
) -> DataFrame:
    """(id, cell, csim, keep) for every corpus row: its assigned cell, its
    cosine to that cell's centroid, and whether it survives SemDeDup
    pruning at ``threshold``. Downstream keeps ``WHERE keep``; the dropped
    complement is the semantic-duplicate set."""
    if not (0.0 < threshold <= 1.0):
        raise AssertionError("threshold must be in (0, 1]")
    if order_by not in ("centroid", "id"):
        raise AssertionError(f"unknown order_by {order_by!r}")
    if method not in ("pandas", "expr"):
        raise AssertionError(f"unknown method {method!r}")
    if isinstance(centroids, str):
        if centroids == "sample":
            C = sample_centroids(corpus, id_col, vec_col, num_cells)
        elif centroids == "kmeans":
            C = kmeans_centroids(corpus, id_col, vec_col, num_cells)
        else:
            raise AssertionError(f"unknown centroids rule {centroids!r}")
    else:
        C = np.asarray(centroids, dtype=np.float64)

    if method == "expr":
        members = _expr_assign_with_sim(corpus, id_col, vec_col, C)
        l = members.select(
            F.col("id").alias("_l_id"),
            F.col("_vec").alias("_l_vec"),
            F.col("cell").alias("cell"),
            F.col("csim").alias("_l_csim"),
        )
        r = members.select(
            F.col("id").alias("_r_id"),
            F.col("_vec").alias("_r_vec"),
            F.col("cell").alias("cell"),
            F.col("csim").alias("_r_csim"),
        )
        if order_by == "centroid":
            earlier = (F.col("_l_csim") < F.col("_r_csim")) | (
                (F.col("_l_csim") == F.col("_r_csim"))
                & (F.col("_l_id") < F.col("_r_id"))
            )
        else:
            earlier = F.col("_l_id") < F.col("_r_id")
        cos = _dot_col(F.col("_l_vec"), F.col("_r_vec")) / (
            _norm_col(F.col("_l_vec")) * _norm_col(F.col("_r_vec"))
        )
        dropped = (
            l.join(r, "cell")
            .where(earlier)
            .where(cos >= F.lit(float(threshold)))
            .select(F.col("_r_id").alias("_d_id"))
            .distinct()
        )
        return (
            members.join(
                dropped, members["id"] == dropped["_d_id"], "left"
            )
            .select(
                "id",
                "cell",
                "csim",
                F.col("_d_id").isNull().alias("keep"),
            )
        )

    # production path: one broadcast-matmul assignment pass, then one
    # shuffle on the cell id; each task prunes one cell with a chunked
    # numpy Gram matrix (never materializing more than chunk × cell sims)
    assign = assign_cells(corpus, id_col, vec_col, C, nprobe=1, method="numpy")
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_vec"))
    members = assign.join(vecs, "id")
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    bC = corpus.sparkSession.sparkContext.broadcast(Cn)
    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("cell", T.IntegerType()),
            T.StructField("csim", T.DoubleType()),
            T.StructField("keep", T.BooleanType()),
        ]
    )
    thr = float(threshold)
    by_centroid = order_by == "centroid"

    def fn(pdf):
        import pandas as pd

        cell = int(pdf["cell"].iloc[0])
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        csim = Xn @ bC.value[cell]
        ids = pdf["id"].to_numpy()
        order = np.lexsort((ids, csim)) if by_centroid else np.argsort(ids)
        Xs = Xn[order]
        n = len(order)
        keep_sorted = np.ones(n, dtype=bool)
        chunk = 2048
        for i0 in range(1, n, chunk):
            i1 = min(i0 + chunk, n)
            S = Xs[i0:i1] @ Xs[:i1].T  # chunk rows vs every earlier rank
            # row k sits at global rank i0+k: only columns j < i0+k are
            # "earlier"; a single boolean grid tests the whole chunk
            earlier_cols = np.arange(i1)[None, :] < (
                i0 + np.arange(i1 - i0)
            )[:, None]
            keep_sorted[i0:i1] &= ~((S >= thr) & earlier_cols).any(axis=1)
        keep = np.empty(n, dtype=bool)
        keep[order] = keep_sorted
        return pd.DataFrame(
            {"id": pdf["id"], "cell": pdf["cell"], "csim": csim, "keep": keep}
        )

    return members.groupBy("cell").applyInPandas(fn, out_schema)
