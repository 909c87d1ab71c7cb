"""Shared pre-plan statistics for the engine's cost-based decisions.

The joins make two cost-based choices Catalyst cannot (they are domain
logic, not relational rewrites): *value dedup* (run the join over distinct
join-attr VALUES when the corpus is duplicate-heavy) and *prefix vs count*
strategy. Both need tiny table statistics. Round 2 computed them with 3-4
sequential driver-blocking jobs per join call; this module collapses the
value-dedup decision into ONE Spark job regardless of side count.

NOTE ON EAGERNESS (advisor finding): calling a join builder with
``value_dedup="auto"`` (the default) runs this stats job at PLAN TIME, before
any action on the returned DataFrame — the physical plan shape depends on
the answer, so it cannot be deferred without making the whole builder lazy.
Callers that build plans without executing them (or that already know their
corpus) should pass ``value_dedup=True/False`` explicitly to skip the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dup_value_stats(sides: list[tuple[DataFrame, str]]) -> tuple[int, int]:
    """(total_rows, total_approx_distinct) over the non-null join attrs.

    ONE Spark job for any number of sides: union the projected columns with a
    side tag, aggregate per side, sum on the driver (per-side distinct counts
    are summed, matching the round-2 per-side semantics — NOT a global
    distinct across sides). At web scale this is one corpus scan of a single
    projected column; pass ``value_dedup`` explicitly to skip it entirely.
    """
    u = None
    for i, (df, col) in enumerate(sides):
        p = df.where(F.col(col).isNotNull()).select(
            F.col(col).alias("_v"), F.lit(i).alias("_side")
        )
        u = p if u is None else u.unionByName(p)
    rows = (
        u.groupBy("_side")
        .agg(F.count("*").alias("n"), F.approx_count_distinct("_v").alias("nd"))
        .collect()
    )
    return sum(r["n"] for r in rows), sum(r["nd"] for r in rows)


def value_dedup_auto(sides: list[tuple[DataFrame, str]], ratio: float = 0.6) -> bool:
    """True when distinct/total < ratio (dup-heavy ⇒ join distinct values)."""
    n, nd = dup_value_stats(sides)
    return n > 0 and nd / n < ratio


def value_hash_col(col) -> Column:
    """16-byte content key for a string value: ``unhex(md5(utf8_bytes))``.

    Used by the value-dedup expansion joins so the shuffle keys are fixed
    16-byte binaries instead of whole document texts (at web scale the raw
    join-attr bytes dominate the expansion shuffle otherwise). 128-bit
    collision probability at 10^12 distinct values is < 10^-13 (birthday
    bound) — the standard content-addressing trade every dedup system makes.
    """
    return F.unhex(F.md5(F.encode(col, "UTF-8")))
