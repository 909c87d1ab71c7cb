"""Cluster medoid — the most-representative record per entity cluster.

The third survivorship rule next to ``canonicalize_clusters`` (ordering
rules: longest/min-id/max-id) and ``golden_record`` (attribute-level
majority fusion): pick the record with the highest TOTAL similarity to
its cluster-mates — the medoid, the classic "most central member"
canonical choice (e.g. Hassanzadeh et al., VLDB 2009 evaluate it for
dedup clusters). Where ``longest`` biases toward verbose variants and
majority vote needs multiple attributes, the medoid is the single-attr
rule robust to outlier members.

Semantics: within each cluster, ``score(r) = Σ_{s ≠ r} jaccard(tok(r),
tok(s))`` over the chosen tokenizer's TOKEN SETS; the medoid maximizes
the score, ties → lowest id. Records absent from the cluster map are
singletons — their own medoid (score NULL, the complete-entity-table
convention of ``canonicalize_clusters``). Both-empty token sets score 0
(the engine's empty-set jaccard convention for non-``allow_empty``
paths).

Determinism / oracle: jaccard is integer set sizes + one fixed-order
float division; per-record totals fold in ascending order (the bm25
``exact_order`` rule), so scores, the (score DESC, id ASC) argmax and the
whole output hash-match the SQL replica.

Scale shape (100 TB test): ONE shuffle keyed on the cluster id (already
the data's natural partitioning post-clustering) for the within-cluster
self-join; the O(|cluster|²) similarity work is the medoid definition's
own cost and real clusters are small by construction — a huge cluster is
an upstream over-merge (``cluster_stats`` is the audit;
``max_cluster_size`` here skips-and-flags it rather than paying quadratic
work). One window per cluster picks the argmax. Zero Python, nothing on
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizers import Tokenizer, WhitespaceTokenizer
from ..plans.validation import validate_attr, validate_attr_type


def cluster_medoid(
    records: DataFrame,
    clusters: DataFrame,
    id_col: str,
    text_attr: str,
    cluster_col: str = "component",
    tokenizer: Tokenizer | None = None,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """(cluster_col, medoid_id, cluster_size, total_sim, mean_sim) — one
    row per cluster (singletons included; their sims are NULL).

    ``max_cluster_size`` guards the O(|cluster|²) self-join against an
    upstream over-merge: clusters larger than the cap are skipped — their
    row carries the true ``cluster_size`` but NULL medoid_id/total_sim/
    mean_sim and ``skipped=true`` — instead of quadratic work on a
    pathological component. The ``skipped`` column is only added when a
    cap is set; ``None`` (default) computes every cluster and keeps the
    historical schema and plan."""
    validate_attr(records, id_col, "records")
    validate_attr(records, text_attr, "records")
    validate_attr_type(records, text_attr, "records")
    validate_attr(clusters, id_col, "clusters")
    validate_attr(clusters, cluster_col, "clusters")
    tok = tokenizer or WhitespaceTokenizer(return_set=True)

    base = (
        records.select(F.col(id_col).alias("_id"), F.col(text_attr).alias("_t"))
        .join(
            clusters.select(
                F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
            ),
            "_id",
            "left",
        )
        .select(
            "_id",
            F.coalesce("_c", F.col("_id")).alias("_c"),
            F.when(F.col("_t").isNotNull(), tok.spark_col(F.col("_t")))
            .otherwise(F.array().cast("array<string>"))
            .alias("_toks"),
        )
    )
    sizes = base.groupBy("_c").agg(F.count(F.lit(1)).alias("cluster_size"))
    if max_cluster_size is not None:
        ok_ids = sizes.where(
            F.col("cluster_size") <= F.lit(max_cluster_size)
        ).select("_c")
        inlier = base.join(ok_ids, "_c", "left_semi")
    else:
        inlier = base
    l = inlier.select(
        F.col("_c").alias("_c"),
        F.col("_id").alias("_l_id"),
        F.col("_toks").alias("_l_toks"),
    )
    r = inlier.select(
        F.col("_c").alias("_c"),
        F.col("_id").alias("_r_id"),
        F.col("_toks").alias("_r_toks"),
    )
    ov = F.size(F.array_intersect("_l_toks", "_r_toks"))
    denom = F.size("_l_toks") + F.size("_r_toks") - ov
    sim = F.when(denom > 0, ov.cast("double") / denom.cast("double")).otherwise(
        F.lit(0.0)
    )
    sims = (
        l.join(r, "_c")
        .where(F.col("_l_id") != F.col("_r_id"))
        .select("_c", "_l_id", sim.alias("_s"))
    )
    totals = sims.groupBy("_c", "_l_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("_s")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_total"),
        F.count(F.lit(1)).alias("_n_others"),
    )
    scored = inlier.select("_c", F.col("_id").alias("_l_id")).join(
        totals, ["_c", "_l_id"], "left"
    )
    w = Window.partitionBy("_c").orderBy(
        F.col("_total").desc_nulls_last(), F.col("_l_id").asc()
    )
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .join(sizes, "_c")
        .select(
            F.col("_c").alias(cluster_col),
            F.col("_l_id").alias("medoid_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("_total").alias("total_sim"),
            (F.col("_total") / F.col("_n_others").cast("double")).alias("mean_sim"),
        )
    )
    if max_cluster_size is None:
        return out
    id_type = base.schema["_id"].dataType
    flagged = sizes.where(
        F.col("cluster_size") > F.lit(max_cluster_size)
    ).select(
        F.col("_c").alias(cluster_col),
        F.lit(None).cast(id_type).alias("medoid_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.lit(None).cast("double").alias("total_sim"),
        F.lit(None).cast("double").alias("mean_sim"),
    )
    return out.withColumn("skipped", F.lit(False)).unionByName(
        flagged.withColumn("skipped", F.lit(True))
    )
