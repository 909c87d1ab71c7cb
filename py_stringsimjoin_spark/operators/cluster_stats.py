"""Cluster-size distribution + hard-negative mining — the ER quality /
training-data utilities around the clustering stage.

Beyond-reference operators (the reference stops at pair output; naming
conventions follow its surface,
/root/reference/py_stringsimjoin/join/jaccard_join_py.py:14-44).

``cluster_stats``: the first thing an ER owner looks at after clustering —
the cluster-size histogram. A healthy web-dedup run is dominated by small
clusters with a thin Zipf tail; one giant component is the classic
transitive-closure over-merge signal (hub token, boilerplate page). One
row per distinct cluster size with cluster/record counts and fractions.

``hard_negatives``: matcher training needs negatives, and UNIFORM random
negatives are trivially easy (random web pages share nothing) — the stock
move is mining the highest-scoring NON-matching candidate pairs per record
(the blocker's near-misses), which is exactly where a learned matcher's
decision boundary lives. Top-k scored pairs per left record after removing
labeled positives. ``random_negative_pairs`` supplies the uniform
complement (both belong in a training mix: easy negatives teach the bulk
separation, hard negatives the boundary).

Scale shape (100 TB test): cluster_stats is two hash aggregations (cluster
→ size, size → counts) + one broadcast scalar — the histogram itself is at
most O(max cluster size) rows. hard_negatives is one left-anti hash join
(labels are pair-keyed, co-partitioned with the candidates) + one
per-record window top-k — identical bones to operators/topk_join.py; skew
= a hot left record, bounded by its candidate count, AQE-absorbed. All
arithmetic is integer counts and IEEE division — bit-identical
cross-engine, driver-oracle-able with no fold tricks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def cluster_stats(
    assignments: DataFrame, key_attr: str, cluster_attr: str
) -> DataFrame:
    """(cluster_size, n_clusters, n_records, frac_clusters, frac_records)
    — one row per distinct cluster size; NULL cluster ids are excluded
    (unassigned records are not a cluster)."""
    validate_attr(assignments, key_attr, "assignments")
    validate_attr(assignments, cluster_attr, "assignments")
    sizes = (
        assignments.where(F.col(cluster_attr).isNotNull())
        .groupBy(F.col(cluster_attr).alias("_c"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.first("cluster_size")).alias("n_records"),
    )
    totals = hist.agg(
        F.sum("n_clusters").alias("_tc"), F.sum("n_records").alias("_tr")
    )
    return hist.crossJoin(F.broadcast(totals)).select(
        "cluster_size",
        "n_clusters",
        "n_records",
        (F.col("n_clusters").cast("double") / F.col("_tc").cast("double")).alias(
            "frac_clusters"
        ),
        (F.col("n_records").cast("double") / F.col("_tr").cast("double")).alias(
            "frac_records"
        ),
    )


def random_negative_pairs(
    table: DataFrame,
    key_attr: str,
    k: int,
    seed: str = "neg",
) -> DataFrame:
    """``k`` deterministic pseudo-random partners per record — the UNIFORM
    negatives that complement ``hard_negatives`` in a matcher training set
    (easy negatives teach the bulk separation, hard negatives the
    boundary). Returns (l_<key>, r_<key>, draw) with l ≠ r guaranteed.

    Construction (engine-independent, rerun/partitioning-stable): records
    get a dense rank 0..N−1 by key order via the TWO-PHASE rank (range
    partition → per-partition row_number → literal offsets; the
    token_ordering.py pattern — never a single-partition global window);
    draw j of record key picks partner rank ``md5(seed, key, j) mod
    (N−1)``, bumped by one when it lands at-or-after the record's own rank
    (the classic skip-self bijection — uniform over the other N−1 records,
    zero rejection/iteration). Joining rank→key resolves partners in one
    equi-join.

    Scale shape: one range-partition shuffle (keys only, no payload) + one
    O(#partitions) offset collect + one hash join on the rank; output
    exactly N·k rows. Draws are md5-derived, so the DuckDB oracle
    reproduces them bit-for-bit (no RNG state anywhere).
    """
    validate_attr(table, key_attr, "input")
    if not (k >= 1):
        raise AssertionError("k must be >= 1")
    base = table.select(F.col(key_attr).alias("_k")).where(
        F.col("_k").isNotNull()
    ).distinct()
    spark = table.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    part = base.repartitionByRange(n_parts, F.col("_k").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(F.col("_k").asc())
    withrn = part.withColumn("_rn", F.row_number().over(w).cast("long") - 1)
    # checkpoint, not persist: the offsets are baked in as literals keyed by
    # spark_partition_id, so the partitioning must never be recomputed with
    # fresh range-sampler boundaries (token_ordering.py:113-121 rationale)
    if spark.sparkContext.getCheckpointDir() is not None:
        local = withrn.checkpoint()
    else:
        local = withrn.localCheckpoint()
    counts = {
        r["_pid"]: r["c"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = (
        F.coalesce(
            *[
                F.when(F.col("_pid") == pid, F.lit(off).cast("long"))
                for pid, off in offsets.items()
            ],
            F.lit(0).cast("long"),
        )
        if offsets
        else F.lit(0).cast("long")
    )
    ranked = local.select("_k", (off_expr + F.col("_rn")).alias("_rank"))
    n_row = ranked.agg(F.count(F.lit(1)).alias("_n"))
    # md5 → first 15 hex chars (60 bits, positive long) → mod (N−1)
    draws = (
        ranked.crossJoin(F.broadcast(n_row))
        .where(F.col("_n") >= 2)
        .select(
            "_k",
            "_rank",
            "_n",
            F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("draw"),
        )
        .withColumn(
            "_h",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit(seed), F.col("_k").cast("string"),
                            F.col("draw").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
        )
        .withColumn("_p", F.col("_h") % (F.col("_n") - 1))
        .withColumn(
            "_p",
            F.when(F.col("_p") >= F.col("_rank"), F.col("_p") + 1).otherwise(
                F.col("_p")
            ),
        )
    )
    partners = ranked.select(
        F.col("_rank").alias("_p"), F.col("_k").alias("_pk")
    )
    return draws.join(partners, "_p").select(
        F.col("_k").alias(f"l_{key_attr}"),
        F.col("_pk").alias(f"r_{key_attr}"),
        F.col("draw").cast("long").alias("draw"),
    )


def hard_negatives(
    scored: DataFrame,
    labels: DataFrame,
    l_attr: str,
    r_attr: str,
    score_attr: str,
    k: int,
    label_l_attr: str | None = None,
    label_r_attr: str | None = None,
    symmetric: bool = False,
) -> DataFrame:
    """Per left record, the ``k`` highest-scoring candidate pairs that are
    NOT labeled positive: (l, r, score, rank). ``symmetric=True`` also
    removes pairs whose REVERSED orientation is labeled (self-join
    candidate sets store each pair once). NULL scores never rank; ties
    break on the right key ascending."""
    validate_attr(scored, l_attr, "scored")
    validate_attr(scored, r_attr, "scored")
    validate_attr(scored, score_attr, "scored")
    if not (k >= 1):
        raise AssertionError("k must be >= 1")
    ll = label_l_attr or l_attr
    rr = label_r_attr or r_attr
    validate_attr(labels, ll, "labels")
    validate_attr(labels, rr, "labels")
    pos = labels.select(F.col(ll).alias("_pl"), F.col(rr).alias("_pr")).distinct()
    if symmetric:
        pos = pos.unionByName(
            pos.select(F.col("_pr").alias("_pl"), F.col("_pl").alias("_pr"))
        ).distinct()
    neg = scored.where(F.col(score_attr).isNotNull()).join(
        pos,
        (F.col(l_attr) == F.col("_pl")) & (F.col(r_attr) == F.col("_pr")),
        "left_anti",
    )
    w = Window.partitionBy(l_attr).orderBy(
        F.col(score_attr).desc(), F.col(r_attr).asc()
    )
    return (
        neg.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
        .select(l_attr, r_attr, score_attr, "rank")
    )
