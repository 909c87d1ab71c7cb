"""Reciprocal-rank fusion (RRF) of ranked retrieval lists — hybrid search.

Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion outperforms Condorcet
and individual Rank Learning Methods" (SIGIR 2009): given per-query ranked
lists from R retrievers, the fused score of a candidate document is

    rrf(q, x) = Σ_{lists L that rank x for q}  1 / (rrf_k + rank_L(q, x))

with the canonical ``rrf_k = 60``. The classic use is hybrid retrieval —
fuse sparse (BM25, operators/bm25.py) with dense (embedding cosine,
operators/ann.py) top-k lists so lexical and semantic evidence both count;
beyond-reference (the reference has no retrieval surface, SURVEY.md §2.5).

Scale shape (100 TB test): one union of the (already small — top-k per
query) ranked lists, one hash aggregation keyed (q, x), one per-query
window for the fused rank. Input lists are k·|queries| rows by
construction, so every stage is bounded by the retrievers' own output —
fusion adds no scan of the corpus and no quadratic stage. Zero Python.

Determinism: rank is an integer, so each list's contribution
``1/(rrf_k + rank)`` is one correctly-rounded double division — identical
on Spark / Python / DuckDB. Contributions per (q, x) are folded in
ascending value order (array_sort + sequential aggregate, the
operators/bm25.py ``exact_order`` trick), making the float64 sum — and
therefore the fused ranking and its deterministic (score DESC, x ASC)
tie-break — bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    lists: list[DataFrame],
    k: int,
    rrf_k: float = 60.0,
    q_col: str = "query_id",
    x_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists into per-query top-``k``: (query_id, neighbor_id,
    n_lists, score, rank). Each input needs columns (q_col, x_col,
    rank_col); extra columns are ignored. ``n_lists`` is how many input
    lists voted for the pair — a useful confidence signal downstream."""
    if not lists:
        raise AssertionError("need at least one ranked list")
    if not (k >= 1 and rrf_k > 0):
        raise AssertionError("require k >= 1 and rrf_k > 0")
    parts = [
        df.select(
            F.col(q_col).alias("query_id"),
            F.col(x_col).alias("neighbor_id"),
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double"))
            ).alias("_c"),
        )
        for df in lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "neighbor_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("_c")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
        .select("query_id", "neighbor_id", "n_lists", "score", "rank")
    )
