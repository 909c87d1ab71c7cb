"""Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge method).

A blocking paradigm the reference does not ship (its blockers are all
set-overlap / character filters, py_stringsimjoin/filter/*.py) but that every
production entity-resolution stack pairs with them: sort the corpus by a
blocking key and emit every record pair whose positions in that order are
less than ``window_size`` apart. Where overlap filters need the match to
share a token, sorted-neighborhood catches near-misses that share only a
sort-order neighborhood (truncated names, swapped fields, typos at the end
of the string) at a guaranteed O(n·w) candidate budget — which is also what
makes it 100 TB-safe: candidate volume is tunable and linear in the corpus,
never quadratic in a hot block.

Spark-first plan, no windows over a single partition at any step:

1. global sorted positions via the same two-phase rank the token ordering
   uses (``repartitionByRange`` on the blocking key → per-partition
   ``row_number`` → tiny per-partition-count collect for the offsets), with
   a checkpoint so the baked offsets can never silently recompute against a
   resampled range partitioning;
2. the window pairs as an EQUI-join: each row explodes ``sequence(1, w-1)``
   forward offsets and joins position + offset == neighbor position. The
   shuffle is exactly n·(w-1) fixed-width rows — no range-join fallback to
   a nested-loop plan, no AQE surprises.

Multi-pass SNM (the standard production recipe — several cheap blocking
keys, union of windows) is ``multipass_sorted_neighborhood``: the union of
single passes, distinct on the pair key.

The pair output is oriented by KEY (``_l_key < _r_key``), not by sort
position, so multi-pass unions of passes with different orders dedup
correctly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def global_sorted_positions(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "_pos",
) -> DataFrame:
    """Append a dense 0-based global position under ``order_cols``.

    Two-phase rank, the scale-safe replacement for a global window: range
    partitioner (phase 1 is parallel per partition), then per-partition
    offsets from an N-row collect. Checkpointed (reliable when the session
    has a checkpoint dir, local otherwise) because the offsets are baked
    into the plan as literals keyed by ``spark_partition_id`` — a lost
    block must fail loudly, not recompute against freshly-sampled range
    boundaries. Same construction as token_ordering.build_token_ordering;
    callers must make ``order_cols`` a total order (tie-break on a key).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    part = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    withrn = part.withColumn("_rn", F.row_number().over(w).cast("long") - 1)
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
    off = F.coalesce(
        *[F.when(F.col("_pid") == pid, F.lit(o).cast("long")) for pid, o in offsets.items()],
        F.lit(0).cast("long"),
    ) if offsets else F.lit(0).cast("long")
    return local.withColumn(out_col, off + F.col("_rn")).drop("_pid", "_rn")


def sorted_neighborhood_pairs(
    table: DataFrame,
    key_attr: str,
    blocking_key: Column | str,
    window_size: int,
) -> DataFrame:
    """Single-pass SNM candidates → DataFrame(_l_key, _r_key), _l_key < _r_key.

    Rows are ordered by ``(blocking_key, key_attr)`` — the key tie-break
    makes the order total, so output is deterministic for any input
    partitioning. Rows whose blocking key is NULL are excluded (they have
    no defined sort neighborhood); a pair is emitted once even when both
    orientations fall inside the window. ``window_size`` is the classic w:
    each record pairs with the w-1 records after it in sort order.
    """
    validate_attr(table, key_attr, "input")
    if window_size < 2:
        raise ValueError("window_size must be >= 2 (w-1 forward neighbors)")
    bk = F.col(blocking_key) if isinstance(blocking_key, str) else blocking_key
    base = table.select(
        F.col(key_attr).alias("_k"), bk.alias("_bk")
    ).where(F.col("_bk").isNotNull())
    pos = global_sorted_positions(
        base, [F.col("_bk").asc(), F.col("_k").asc()]
    ).select("_k", "_pos")
    probe = pos.select(
        F.col("_k").alias("_k1"),
        F.col("_pos").alias("_p0"),
        F.explode(F.sequence(F.lit(1), F.lit(window_size - 1))).alias("_off"),
    ).select("_k1", (F.col("_p0") + F.col("_off")).alias("_pos"))
    pairs = probe.join(pos, "_pos").select(
        F.least("_k1", "_k").alias("_l_key"),
        F.greatest("_k1", "_k").alias("_r_key"),
    )
    return pairs


def sorted_neighborhood_pairs_two_tables(
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_blocking_key: Column | str,
    r_blocking_key: Column | str,
    window_size: int,
) -> DataFrame:
    """R≠S sorted-neighborhood → DataFrame(_l_key, _r_key).

    The record-linkage form of SNM: both tables merge into ONE sort order
    (the whole point — a left record's nearest sort neighbors from the
    right table land next to it even when neither side shares a token),
    and a pair is emitted when the two records are less than
    ``window_size`` apart in that merged order. Only cross-table pairs are
    returned; ``_l_key`` always refers to ``ltable``. The merged order is
    made total by (blocking key, side, key), so output is deterministic.
    NULL blocking keys are excluded as in the single-table pass.
    """
    if window_size < 2:
        raise ValueError("window_size must be >= 2 (w-1 forward neighbors)")
    validate_attr(ltable, l_key_attr, "left")
    validate_attr(rtable, r_key_attr, "right")
    lbk = F.col(l_blocking_key) if isinstance(l_blocking_key, str) else l_blocking_key
    rbk = F.col(r_blocking_key) if isinstance(r_blocking_key, str) else r_blocking_key
    merged = (
        ltable.select(
            F.col(l_key_attr).alias("_k"), lbk.alias("_bk"), F.lit(0).alias("_side")
        )
        .where(F.col("_bk").isNotNull())
        .unionByName(
            rtable.select(
                F.col(r_key_attr).alias("_k"), rbk.alias("_bk"), F.lit(1).alias("_side")
            ).where(F.col("_bk").isNotNull())
        )
    )
    pos = global_sorted_positions(
        merged, [F.col("_bk").asc(), F.col("_side").asc(), F.col("_k").asc()]
    ).select("_k", "_side", "_pos")
    probe = pos.select(
        F.col("_k").alias("_k1"),
        F.col("_side").alias("_side1"),
        F.col("_pos").alias("_p0"),
        F.explode(F.sequence(F.lit(1), F.lit(window_size - 1))).alias("_off"),
    ).select("_k1", "_side1", (F.col("_p0") + F.col("_off")).alias("_pos"))
    return (
        probe.join(pos, "_pos")
        .where(F.col("_side1") != F.col("_side"))
        .select(
            F.when(F.col("_side1") == 0, F.col("_k1")).otherwise(F.col("_k")).alias("_l_key"),
            F.when(F.col("_side1") == 0, F.col("_k")).otherwise(F.col("_k1")).alias("_r_key"),
        )
    )


def multipass_sorted_neighborhood(
    table: DataFrame,
    key_attr: str,
    blocking_keys: list[Column | str],
    window_size: int,
) -> DataFrame:
    """Union of single-pass windows over several blocking keys, distinct.

    The standard multi-pass SNM: each pass is cheap and misses differently,
    the union recovers matches any single sort order loses. Output keys are
    orientation-normalized by the single-pass contract, so the distinct is
    a plain pair-key dedup.
    """
    if not blocking_keys:
        raise ValueError("blocking_keys must be non-empty")
    out = None
    for bk in blocking_keys:
        p = sorted_neighborhood_pairs(table, key_attr, bk, window_size)
        out = p if out is None else out.unionByName(p)
    return out.distinct()
