"""Blocking- and matching-quality metrics for entity-resolution runs.

Standard ER evaluation over a candidate set (the blocking stage's output)
and a labeled pair table (ground truth):

* pairs completeness (PC) — recall of blocking: |cand ∩ true| / |true|;
* pairs quality (PQ) — precision of blocking: |cand ∩ true| / |cand|;
* reduction ratio (RR) — 1 − |cand| / |ltable × rtable|, the fraction of
  the cross product blocking pruned away.

The reference engine reports none of these (its tests assert exact result
sets); a production linkage pipeline tunes thresholds/blocking on them.
Complements ``plans.pipeline.pairwise_f1`` (cluster-level score) with the
blocking-stage view.

Scale shape: two semi-join counts plus the input cardinalities — four
count jobs on already-keyed data, no new shuffles beyond one hash join per
metric. Key pairs are compared as (l_key, r_key) tuples; pass
``symmetric=True`` when candidates/labels are unordered self-join pairs so
(a,b) matches (b,a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame, l: str, r: str, symmetric: bool) -> DataFrame:
    a, b = F.col(l), F.col(r)
    if symmetric:
        return df.select(
            F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b")
        ).distinct()
    return df.select(a.alias("_a"), b.alias("_b")).distinct()


def blocking_metrics(
    candset: DataFrame,
    labeled: DataFrame,
    cand_l: str = "l_key",
    cand_r: str = "r_key",
    label_l: str = "l_key",
    label_r: str = "r_key",
    ltable: DataFrame | None = None,
    rtable: DataFrame | None = None,
    symmetric: bool = False,
) -> DataFrame:
    """Lazy one-row DataFrame with the same metrics as ``evaluate_blocking``.

    Fully declarative — counts are aggregations cross-joined into one plan
    (each a 1-row broadcast), so it composes into pipelines and runs as ONE
    job instead of four. Pass ``ltable``/``rtable`` to get
    ``reduction_ratio`` (their row counts fold in lazily too; with
    ``symmetric=True`` and ``rtable is ltable``, the cross-product size is
    n·(n−1)/2 — the self-join convention; two distinct tables use n_l·n_r
    even when pairs are unordered, matching ``evaluate_blocking``).
    Integer-ratio divisions are IEEE-exact, so the output is cross-engine
    hash-stable.
    """
    cand = _canon(candset, cand_l, cand_r, symmetric)
    true = _canon(labeled, label_l, label_r, symmetric)
    found = cand.join(true, ["_a", "_b"], "left_semi")

    counts = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(F.broadcast(true.agg(F.count(F.lit(1)).alias("n_true"))))
        .crossJoin(F.broadcast(found.agg(F.count(F.lit(1)).alias("n_true_found"))))
    )
    if ltable is not None and rtable is not None:
        # the n·(n−1)/2 self-join convention applies only when both sides
        # really are the same table — mirroring evaluate_blocking's
        # `symmetric and n_left == n_right` guard; unordered pairs across
        # two DIFFERENT tables still have an n_l·n_r cross product
        if symmetric and rtable is ltable:
            tot = ltable.agg(
                (
                    F.count(F.lit(1)).cast("double")
                    * (F.count(F.lit(1)) - 1).cast("double")
                    / F.lit(2.0)
                ).alias("_total")
            )
        else:
            tot = (
                ltable.agg(F.count(F.lit(1)).cast("double").alias("_nl"))
                .crossJoin(
                    F.broadcast(rtable.agg(F.count(F.lit(1)).cast("double").alias("_nr")))
                )
                .select((F.col("_nl") * F.col("_nr")).alias("_total"))
            )
        counts = counts.crossJoin(F.broadcast(tot))
        rr = F.lit(1.0) - F.col("n_candidates").cast("double") / F.nullif(
            F.col("_total"), F.lit(0.0)
        )
    else:
        rr = F.lit(None).cast("double")

    return counts.select(
        "n_candidates",
        "n_true",
        "n_true_found",
        (
            F.col("n_true_found").cast("double")
            / F.nullif(F.col("n_true"), F.lit(0)).cast("double")
        ).alias("pairs_completeness"),
        (
            F.col("n_true_found").cast("double")
            / F.nullif(F.col("n_candidates"), F.lit(0)).cast("double")
        ).alias("pairs_quality"),
        rr.alias("reduction_ratio"),
    )


def evaluate_blocking(
    candset: DataFrame,
    labeled: DataFrame,
    cand_l: str = "l_key",
    cand_r: str = "r_key",
    label_l: str = "l_key",
    label_r: str = "r_key",
    n_left: int | None = None,
    n_right: int | None = None,
    symmetric: bool = False,
) -> dict:
    """{"pairs_completeness", "pairs_quality", "reduction_ratio",
    "n_candidates", "n_true", "n_true_found"}.

    ``reduction_ratio`` needs the cross-product size — pass ``n_left`` /
    ``n_right`` (row counts of the blocked tables); it is ``None`` when
    omitted. This is an ACTION (runs count jobs), not a lazy plan — call it
    on evaluation runs, not in a per-query hot path.
    """
    cand = _canon(candset, cand_l, cand_r, symmetric)
    true = _canon(labeled, label_l, label_r, symmetric)
    n_cand = cand.count()
    n_true = true.count()
    n_found = cand.join(true, ["_a", "_b"], "left_semi").count()
    pc = n_found / n_true if n_true else None
    pq = n_found / n_cand if n_cand else None
    rr = None
    if n_left is not None and n_right is not None:
        total = (
            n_left * (n_left - 1) / 2 if symmetric and n_left == n_right
            else n_left * n_right
        )
        rr = 1.0 - n_cand / total if total else None
    return {
        "pairs_completeness": pc,
        "pairs_quality": pq,
        "reduction_ratio": rr,
        "n_candidates": n_cand,
        "n_true": n_true,
        "n_true_found": n_found,
    }
