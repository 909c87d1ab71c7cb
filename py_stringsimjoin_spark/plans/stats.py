"""Shared pre-plan statistics for the engine's cost-based decisions.

The joins make three cost-based choices Catalyst cannot (they are domain
logic, not relational rewrites): *value dedup* (run the join over distinct
join-attr VALUES when the corpus is duplicate-heavy), *prefix vs count*
strategy, and *inline vs rejoin* verify placement. All need tiny table
statistics.

Round 3 computed them with full-corpus driver-blocking jobs per join call
(count + approx_count_distinct over every join attr, then an avg-size
aggregation that materialized the whole ranked-token table at plan time) —
at 100 TB that is two-to-three extra corpus reads per query. Round 4
replaces them with ONE bounded-sample job: each side contributes at most
``spark.py_stringsimjoin.statsSampleRows`` rows (default 100k) via
``limit()``, which Spark satisfies by reading a handful of input partitions
— the job's cost is O(sample), independent of corpus size. The decisions
these estimates feed are pure physical-plan choices; every strategy produces
identical output, so a sampling miss costs performance, never correctness.
Set the conf to ``0`` to restore exact full-corpus statistics, or pass
``value_dedup=`` / ``strategy=`` explicitly to skip the job entirely.

NOTE ON EAGERNESS: the stats job still runs at PLAN TIME (the physical plan
shape depends on the answer, so it cannot be deferred) — but it is now a
bounded read, not a corpus scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SAMPLE_ROWS = 100_000


from contextlib import contextmanager  # noqa: E402


@contextmanager
def util_shuffle_scope(spark):
    """Run a PLAN-TIME utility job (vocab probe, sampled stats, hot-token
    sample) with a reduced ``spark.sql.shuffle.partitions``.

    The kernels size their shuffles by WORKLOAD (e.g. the bench pins 256
    for the row-level joins); utility jobs aggregate vocabulary- or
    sample-sized data and don't need kernel-sized reduce fan-out —
    cached-plan materializations in particular never AQE-coalesce
    (canChangeCachedPlanOutputPartitioning defaults false).
    ``spark.py_stringsimjoin.utilShufflePartitions`` (default
    ``max(32, shuffle_partitions // 8)``) keeps them wide enough for real
    corpora (the default scales with the session's own sizing) while
    avoiding near-empty task waves locally.

    Caveat (documented, same policy as engine_cache_scope): the conf is
    session-global for the duration of the eager job — a concurrent
    thread PLANNING a query in the same session may pick it up. Join
    EXECUTION is unaffected (the kernels' exchanges read the conf at their
    own action time, outside any scope).
    """
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    util = spark.conf.get("spark.py_stringsimjoin.utilShufflePartitions", "")
    n = int(util) if util else max(32, int(old) // 8)
    if n >= int(old):
        yield
        return
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _sample_rows_conf(df: DataFrame) -> int:
    return int(
        df.sparkSession.conf.get(
            "spark.py_stringsimjoin.statsSampleRows", str(DEFAULT_SAMPLE_ROWS)
        )
    )


def sample_plan_stats(
    sides: list[tuple[DataFrame, str]],
    tokenizer=None,
    prefix_col_fn: Callable[[Column], Column] | None = None,
    sample_rows: int | None = None,
) -> dict:
    """ONE bounded Spark job → the estimates every plan-time decision needs.

    Returns ``{"n", "nd", "avg_size", "avg_pfx"}`` (the last two only when a
    tokenizer is given): per-side row count, per-side approx-distinct of the
    join attr (summed across sides, matching the round-2 per-side
    semantics), and the row-weighted average token-set size / prefix length.
    Each side is capped at ``sample_rows`` rows (``limit`` — a bounded read
    of the first input partitions, not a corpus scan); ``sample_rows<=0``
    means exact full-table statistics.
    """
    if sample_rows is None:
        sample_rows = _sample_rows_conf(sides[0][0])
    u = None
    for i, (df, col) in enumerate(sides):
        p = df.where(F.col(col).isNotNull()).select(
            F.col(col).alias("_v"), F.lit(i).alias("_side")
        )
        if sample_rows > 0:
            p = p.limit(sample_rows)
        u = p if u is None else u.unionByName(p)
    aggs = [F.count("*").alias("n"), F.approx_count_distinct("_v").alias("nd")]
    if tokenizer is not None:
        # the global limit above collapses to ONE partition, so the sample's
        # tokenize (the job's only real work) would run single-task; widen it
        # back to the utility parallelism first (plans/layout.py)
        from .layout import widen_small_scan

        u = widen_small_scan(u)
        u = u.withColumn("_sz", F.size(tokenizer.spark_col(F.col("_v"))))
        aggs.append(F.avg("_sz").alias("s"))
        if prefix_col_fn is not None:
            aggs.append(F.avg(prefix_col_fn(F.col("_sz"))).alias("p"))
    with util_shuffle_scope(u.sparkSession):
        rows = u.groupBy("_side").agg(*aggs).collect()
    n = sum(r["n"] for r in rows)
    out = {"n": n, "nd": sum(r["nd"] for r in rows)}
    if tokenizer is not None:
        tot = n or 1
        out["avg_size"] = sum((r["s"] or 0.0) * r["n"] for r in rows) / tot
        if prefix_col_fn is not None:
            out["avg_pfx"] = sum((r["p"] or 0.0) * r["n"] for r in rows) / tot
    return out


def dup_value_stats(
    sides: list[tuple[DataFrame, str]], sample_rows: int | None = None
) -> tuple[int, int]:
    """(rows, approx_distinct) over the non-null join attrs — sample-bounded."""
    st = sample_plan_stats(sides, sample_rows=sample_rows)
    return st["n"], st["nd"]


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
