"""Sessionization: split each entity's event stream into sessions at
inactivity gaps — the standard clickstream/crawl-log primitive (a session
ends when more than ``gap`` elapses between consecutive events).

Beyond-reference operator (the reference has no event model; conventions
follow its join-surface naming,
/root/reference/py_stringsimjoin/join/jaccard_join_py.py:14-44). Web-scale
linkage pipelines need it for behavioral blocking ("events in the same
session co-refer"), crawl-batch reconstruction from timestamps, and
training-data episode assembly.

Plan: ONE window shuffle partitioned by the entity key — ``lag`` marks
gap-openers, a running ``sum`` over the same window spec numbers the
sessions (Catalyst evaluates both functions in a single Window node over
one sort), so the whole operator is a single exchange. ``session_stats``
adds one hash aggregation on (key, session_index) — partial-aggregated
map-side, same shuffle key family as the window, AQE-coalesced.

Ordering inside an entity is (ts, id) — the id tiebreak makes equal
timestamps deterministic on every engine and every partitioning. ``on``
columns are numeric (epoch micros/seconds — same convention as
operators/asof_join.py / band_join.py); NULL timestamps and NULL keys are
excluded (an unplaceable event belongs to no session). All arithmetic is
integer/long — bit-identical cross-engine, driver-oracle-able.

Scale shape (100 TB test): millions of small per-entity groups = ideal
window parallelism; a hot entity (one bot user) degrades to a single-task
sort of that entity only. Session indexes are per-entity dense ranks
starting at 0, stable under reruns; the global session key is the pair
(key, session_index) — never a driver-side counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def sessionize(
    events: DataFrame,
    id_attr: str,
    key_attr: str,
    ts_attr: str,
    gap: float | int,
) -> DataFrame:
    """One row per input event: (id, key, ts, session_index) — sessions
    split where the gap to the previous event of the SAME key exceeds
    ``gap`` (strictly; an exactly-``gap`` pause continues the session)."""
    validate_attr(events, id_attr, "events")
    validate_attr(events, key_attr, "events")
    validate_attr(events, ts_attr, "events")
    if not (gap > 0):
        raise AssertionError("gap must be > 0")
    base = events.where(
        F.col(ts_attr).isNotNull() & F.col(key_attr).isNotNull()
    ).select(
        F.col(id_attr).alias("_id"),
        F.col(key_attr).alias("_k"),
        F.col(ts_attr).alias("_ts"),
    )
    w = Window.partitionBy("_k").orderBy(F.col("_ts").asc(), F.col("_id").asc())
    opener = (
        F.when(F.lag("_ts").over(w).isNull(), F.lit(1))
        .when(F.col("_ts") - F.lag("_ts").over(w) > F.lit(gap), F.lit(1))
        .otherwise(F.lit(0))
    )
    return base.select(
        "_id",
        "_k",
        "_ts",
        (F.sum(opener).over(w) - F.lit(1)).cast("long").alias("session_index"),
    ).select(
        F.col("_id").alias(id_attr),
        F.col("_k").alias(key_attr),
        F.col("_ts").alias(ts_attr),
        "session_index",
    )


def session_stats(
    events: DataFrame,
    id_attr: str,
    key_attr: str,
    ts_attr: str,
    gap: float | int,
) -> DataFrame:
    """One row per session: (key, session_index, session_start,
    session_end, n_events, duration) — ``sessionize`` + one aggregation."""
    s = sessionize(events, id_attr, key_attr, ts_attr, gap)
    return (
        s.groupBy(key_attr, "session_index")
        .agg(
            F.min(ts_attr).alias("session_start"),
            F.max(ts_attr).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_attr) - F.min(ts_attr)).alias("duration"),
        )
    )
