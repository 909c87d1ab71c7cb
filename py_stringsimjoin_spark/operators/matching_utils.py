"""One-to-one match assignment + score-distribution histogram — the two
post-scoring utilities a clean-clean linkage pipeline runs before and
after threshold-picking.

Beyond-reference operators (the reference emits raw scored pairs and
stops; conventions follow its output surface,
/root/reference/py_stringsimjoin/join/jaccard_join_py.py:14-44).

``mutual_best_match``: clean-clean ER (two duplicate-free sources) wants a
one-to-one assignment, but globally-optimal bipartite matching is
inherently sequential. The standard distributed surrogate is the MUTUAL
best match (reciprocal nearest neighbor): keep (l, r) iff r is l's
highest-scoring candidate AND l is r's — a guaranteed partial matching
(each side appears at most once), deterministic ties, two window passes.
Pairs it drops are exactly the ambiguous ones a clerical-review queue
should see (compose with ``sample_pairs_for_review``).

``score_histogram``: fixed-width bins over a score column — the
threshold-picking view of a scored candidate set (where are the two modes,
where is the valley). Exact arithmetic: bin width is computed once from
the global (min, max); every bin boundary is the same IEEE double on
every engine, so counts are bit-identical cross-engine (unlike
percentile-sketch approaches, which are engine-specific).

Scale shape (100 TB test): mutual_best_match is two window top-1 passes
(shuffle on l key, shuffle on r key — Spark's WindowGroupLimit pushes the
rank-1 filter below the sort, so no full per-group sort materializes) and
one self-equi-join of the two winner sets. score_histogram is one global
2-scalar aggregate broadcast back + one hash aggregation on the bin id —
bounded by ``n_bins`` output rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def mutual_best_match(
    scored: DataFrame,
    l_attr: str,
    r_attr: str,
    score_attr: str,
    min_score: float | None = None,
) -> DataFrame:
    """(l, r, score) pairs where each is the other's single best candidate
    (reciprocal top-1; ties break on the partner key ascending — total
    order, stable everywhere). ``min_score`` pre-filters weak candidates;
    NULL scores never match."""
    validate_attr(scored, l_attr, "scored")
    validate_attr(scored, r_attr, "scored")
    validate_attr(scored, score_attr, "scored")
    s = scored.where(F.col(score_attr).isNotNull())
    if min_score is not None:
        s = s.where(F.col(score_attr) >= F.lit(min_score))
    s = s.select(l_attr, r_attr, score_attr)
    wl = Window.partitionBy(l_attr).orderBy(
        F.col(score_attr).desc(), F.col(r_attr).asc()
    )
    wr = Window.partitionBy(r_attr).orderBy(
        F.col(score_attr).desc(), F.col(l_attr).asc()
    )
    best_l = s.withColumn("_rn", F.row_number().over(wl)).where(
        F.col("_rn") == 1
    ).drop("_rn")
    best_r = s.withColumn("_rn", F.row_number().over(wr)).where(
        F.col("_rn") == 1
    ).drop("_rn")
    return best_l.join(best_r, [l_attr, r_attr, score_attr])


def score_histogram(
    scored: DataFrame, score_attr: str, n_bins: int = 50
) -> DataFrame:
    """(bin, bin_lo, bin_hi, n_pairs) — ``n_bins`` equal-width bins over
    [min, max] of the score column (the max lands in the LAST bin, not a
    one-past-the-end bin); one row per NON-EMPTY bin. NULL scores are
    excluded; a constant score column yields one bin."""
    validate_attr(scored, score_attr, "scored")
    if not (n_bins >= 1):
        raise AssertionError("n_bins must be >= 1")
    s = scored.where(F.col(score_attr).isNotNull()).select(
        F.col(score_attr).cast("double").alias("_s")
    )
    ext = s.agg(F.min("_s").alias("_lo"), F.max("_s").alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    binned = s.crossJoin(F.broadcast(ext)).select(
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col("_s") - F.col("_lo")) / width).cast("int"),
            )
        )
        .cast("long")
        .alias("bin"),
        "_lo",
        "_hi",
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.first("_lo").alias("_lo"),
        F.first("_hi").alias("_hi"),
    )
    bw = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    return hist.select(
        "bin",
        (F.col("_lo") + F.col("bin").cast("double") * bw).alias("bin_lo"),
        (F.col("_lo") + (F.col("bin") + F.lit(1)).cast("double") * bw).alias(
            "bin_hi"
        ),
        "n_pairs",
    )
