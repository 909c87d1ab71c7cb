"""Numeric band join: |l.attr − r.attr| ≤ eps, as a bucketed equi-join.

Record-linkage blocks on more than strings: prices, timestamps, geo
coordinates, measurement values. The reference engine has no numeric
blocker (its filters are all token-based,
/root/reference/py_stringsimjoin/filter/*.py); a naive `JOIN ON
abs(a.v − b.v) <= eps` is a cross join with a residual predicate — O(n²)
comparisons, the exact plan Spark must never run at 10^12 rows.

This module re-expresses the band predicate as the standard bucketed
range join: bucket id b = floor(v / eps); a pair within eps always lands
in the same or adjacent buckets, so the LEFT side is replicated into
(b−1, b, b+1) and equi-joined on the bucket id — a plain hash shuffle
join Catalyst/AQE can size and skew-handle — then the exact |Δ| ≤ eps
predicate verifies inline. Each side is scanned once; replication factor
is exactly 3 on one side only.

Timestamps join through their epoch seconds (``F.unix_timestamp``) with
eps in seconds — same kernel.

Skew note: heavily repeated values put all their rows in one bucket; the
join key can be salted exactly like the token joins (plans/skew.py) —
left as the caller's composition since numeric distributions are usually
far flatter than token frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def band_join(
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_band_attr: str,
    r_band_attr: str,
    eps: float,
    self_join_dedup: bool = False,
) -> DataFrame:
    """Pairs (l_<key>, r_<key>, l_val, r_val, abs_diff) with |Δ| ≤ eps.

    ``self_join_dedup=True`` keeps only l_key < r_key (numeric or string
    keys — the natural self-join convention used across the engine).
    NULL band attrs never match (same policy as the string joins'
    allow_missing=False default).
    """
    if not (eps > 0):
        raise AssertionError("eps must be > 0")
    validate_attr(ltable, l_key_attr, "left")
    validate_attr(rtable, r_key_attr, "right")
    validate_attr(ltable, l_band_attr, "left")
    validate_attr(rtable, r_band_attr, "right")

    out_l = f"l_{l_key_attr}"
    out_r = f"r_{r_key_attr}"
    l = ltable.where(F.col(l_band_attr).isNotNull()).select(
        F.col(l_key_attr).alias(out_l),
        F.col(l_band_attr).cast("double").alias("_lv"),
    )
    r = rtable.where(F.col(r_band_attr).isNotNull()).select(
        F.col(r_key_attr).alias(out_r),
        F.col(r_band_attr).cast("double").alias("_rv"),
    )
    bucket = lambda c: F.floor(c / F.lit(float(eps)))  # noqa: E731
    l_b = l.select(
        "*",
        F.explode(
            F.array(bucket(F.col("_lv")) - 1, bucket(F.col("_lv")), bucket(F.col("_lv")) + 1)
        ).alias("_b"),
    )
    r_b = r.select("*", bucket(F.col("_rv")).alias("_b"))
    joined = l_b.join(r_b, "_b").where(
        F.abs(F.col("_lv") - F.col("_rv")) <= F.lit(float(eps))
    )
    if self_join_dedup:
        joined = joined.where(F.col(out_l) < F.col(out_r))
    return joined.select(
        out_l,
        out_r,
        F.col("_lv").alias(f"l_{l_band_attr}"),
        F.col("_rv").alias(f"r_{r_band_attr}"),
        F.abs(F.col("_lv") - F.col("_rv")).alias("abs_diff"),
    )
