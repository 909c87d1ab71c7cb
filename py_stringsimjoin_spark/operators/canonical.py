"""Cluster canonicalization (survivorship): one representative per cluster.

The last stage of a record-linkage pipeline after transitive clustering
(``operators/connected_components.py``): given cluster assignments and the
source records, pick a canonical record per cluster by a deterministic
ordering rule and report cluster stats. The reference engine stops at match
pairs (`/root/reference/py_stringsimjoin/join/jaccard_join_py.py` returns a
candset); survivorship is the beyond-reference step that turns clusters into
a deduplicated entity table.

Strategies (all total orders — ties broken by ascending id so reruns and
engines agree bit-for-bit):

* ``"longest"`` — keep the record with the longest non-null value of
  ``rank_attr`` (richest surviving record), then lowest id;
* ``"min_id"``  — lowest id (stable canonical key);
* ``"max_id"``  — highest id.

Scale shape: one shuffle on ``cluster_col`` for the window rank + one
broadcast-free aggregation for the stats — both keyed on the cluster id,
which is already the data's natural partitioning after clustering. No UDFs,
no collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def canonicalize_clusters(
    records: DataFrame,
    clusters: DataFrame,
    id_col: str,
    cluster_col: str = "component",
    rank_attr: str | None = None,
    strategy: str = "longest",
    keep_attrs: list[str] | None = None,
) -> DataFrame:
    """One row per cluster: (cluster_col, canonical_id, cluster_size,
    *keep_attrs of the canonical record).

    ``records`` is the source table keyed by ``id_col``; ``clusters`` maps
    ``id_col`` → ``cluster_col`` (e.g. ``connected_components`` output).
    Records without a cluster row are singletons: they surface as their own
    cluster (cluster id = their own id), so the output is a complete entity
    table, not just the merged part.
    """
    validate_attr(records, id_col, "records")
    validate_attr(clusters, id_col, "clusters")
    validate_attr(clusters, cluster_col, "clusters")
    if strategy not in ("longest", "min_id", "max_id"):
        raise AssertionError(f"unknown strategy {strategy!r}")
    if strategy == "longest":
        if rank_attr is None:
            raise AssertionError('strategy="longest" requires rank_attr')
        validate_attr(records, rank_attr, "records")

    keep_attrs = keep_attrs or []
    for a in keep_attrs:
        validate_attr(records, a, "records")

    assigned = records.join(
        clusters.select(id_col, cluster_col), id_col, "left"
    ).withColumn(
        cluster_col,
        F.coalesce(F.col(cluster_col), F.col(id_col)),
    )

    if strategy == "longest":
        order = [
            F.length(F.coalesce(F.col(rank_attr), F.lit(""))).desc(),
            F.col(id_col).asc(),
        ]
    elif strategy == "min_id":
        order = [F.col(id_col).asc()]
    else:
        order = [F.col(id_col).desc()]

    w = Window.partitionBy(cluster_col).orderBy(*order)
    ranked = assigned.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_sz", F.count(F.lit(1)).over(Window.partitionBy(cluster_col))
    )
    return ranked.where(F.col("_rn") == 1).select(
        F.col(cluster_col),
        F.col(id_col).alias("canonical_id"),
        F.col("_sz").alias("cluster_size"),
        *[F.col(a) for a in keep_attrs],
    )


def golden_record(
    records: DataFrame,
    clusters: DataFrame,
    id_col: str,
    fuse_attrs: list[str],
    cluster_col: str = "component",
) -> DataFrame:
    """Attribute-level survivorship: one FUSED row per cluster.

    Where ``canonicalize_clusters`` keeps one whole source record,
    ``golden_record`` builds a synthetic "golden" entity by fusing each
    attribute independently: per cluster and attribute, the most frequent
    non-null value wins (majority vote), ties broken by the smallest value
    — a total order, so reruns and engines agree exactly. The reference
    stops at match pairs; fusion is the standard ER step downstream of
    clustering (it is what master-data systems publish).

    Records without a cluster assignment are singletons (cluster id = own
    id), so the output covers every input entity.

    Output: ``(cluster_col, cluster_size, *fuse_attrs)``. Fused values are
    computed over the STRING form of each attribute (a single melted pass;
    the vote and tie-break compare strings) and cast back to the
    attribute's original type on output.

    Scale shape: cluster assignment is one hash join on ``id_col``; the
    melt is a generator expression (no shuffle); the vote is ONE hash
    aggregation keyed on (cluster, attr, value) + a window rank partitioned
    by (cluster, attr); the pivot back to columns is a second aggregation
    on the cluster id. Shuffle count is independent of the number of fused
    attributes, and every key includes the cluster id — the data's natural
    partitioning after clustering. No UDFs, nothing collected.
    """
    validate_attr(records, id_col, "records")
    validate_attr(clusters, id_col, "clusters")
    validate_attr(clusters, cluster_col, "clusters")
    if not fuse_attrs:
        raise AssertionError("fuse_attrs must be non-empty")
    for a in fuse_attrs:
        validate_attr(records, a, "records")

    dtypes = dict(records.dtypes)
    assigned = records.join(
        clusters.select(id_col, cluster_col), id_col, "left"
    ).withColumn(cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col)))

    sizes = assigned.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )

    melted = assigned.select(
        cluster_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("_attr"),
                        F.col(a).cast("string").alias("_val"),
                    )
                    for a in fuse_attrs
                ]
            )
        ).alias("_kv"),
    ).select(cluster_col, "_kv._attr", "_kv._val").where(F.col("_val").isNotNull())

    counts = melted.groupBy(cluster_col, "_attr", "_val").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w = Window.partitionBy(cluster_col, "_attr").orderBy(
        F.col("_cnt").desc(), F.col("_val").asc()
    )
    winners = counts.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    )

    fused = winners.groupBy(cluster_col).agg(
        *[
            F.max(F.when(F.col("_attr") == a, F.col("_val")))
            .cast(dtypes[a])
            .alias(a)
            for a in fuse_attrs
        ]
    )
    return sizes.join(fused, cluster_col, "left").select(
        cluster_col, "cluster_size", *fuse_attrs
    )
