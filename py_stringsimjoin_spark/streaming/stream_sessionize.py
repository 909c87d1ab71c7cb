"""Stateful streaming sessionization: the unbounded twin of
``operators/sessionize.py`` — per-entity inactivity-gap sessions over a
stream, closed sessions emitted as they close.

Semantics (deterministic, replay-stable — EVENT-time gaps, never
processing time):

* events hash-partition by the entity key; each key's open session lives
  in the state store as (session_index, session_start, last_ts, n_events);
* inside the per-key Arrow kernel, batch rows process in (ts, id) order —
  the same total order the batch operator sorts by — so replaying the same
  micro-batches always yields the same sessions;
* an event with ``ts − last_ts > gap`` CLOSES the open session (one output
  row: key, session_index, session_start, session_end, n_events, duration)
  and opens the next;
* the final open session per key stays in state — it cannot know it is
  over until a later event (or an operational timeout a production query
  would configure) says so. ``session_stats_closed_replay`` is the exact
  batch equivalent: all sessions but each key's LAST.
* late events (ts ≤ last_ts, possible across micro-batch boundaries) fold
  into the OPEN session — count + boundary update, never a retro-split;
  replay equivalence therefore assumes in-order arrival per key (the same
  assumption a watermarked window agg makes before dropping late rows).

Scale shape: one shuffle on the entity key (the state-store partitioning);
state = 4 longs per LIVE entity — bounded by active entities, not events.
Output is append-mode (closed sessions are immutable facts), so any sink
works and no watermark-driven result rewriting is needed. The reference
engine has no streaming surface (SURVEY.md §2.5); the batch twin is
``operators/sessionize.session_stats``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_index", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("session_index", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration", T.LongType()),
    ]
)


def _make_kernel(gap: int):
    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["_ts", "_id"]
        )
        if state.exists:
            si, start, last, n = state.get
        else:
            si, start, last, n = -1, None, None, 0
        closed = []
        for ts in rows["_ts"].to_numpy():
            ts = int(ts)
            if last is None:
                si, start, last, n = si + 1, ts, ts, 1
            elif ts - last > gap:
                closed.append((key[0], si, start, last, n, last - start))
                si, start, last, n = si + 1, ts, ts, 1
            else:
                # start = min(start, ts): a late (out-of-order) event that
                # still folds into the open session must be able to LOWER
                # the session start, or start/duration silently diverge
                # from the batch operator under bounded disorder (round-5
                # advisor finding). In-order streams never hit the min.
                start, last, n = min(start, ts), max(last, ts), n + 1
        state.update((si, start, last, n))
        yield pd.DataFrame(closed, columns=[f.name for f in _OUT_SCHEMA])

    return kernel


def streaming_sessionize(
    stream: DataFrame,
    id_attr: str,
    key_attr: str,
    ts_attr: str,
    gap: int,
) -> DataFrame:
    """Append-mode stream of CLOSED sessions: (key, session_index,
    session_start, session_end, n_events, duration). NULL key/ts events are
    dropped (same carve-out as the batch operator).

    Column-type contract (round-5 advisor finding): id/key/ts must be
    integral (byte/short/int/long) — the state schema is long-typed.
    Validated up front with a clear error instead of the previous silent
    cast, which under ANSI mode threw mid-stream on non-numeric strings
    and under non-ANSI collapsed every non-castable key into one NULL
    state group (merging sessions across entities)."""
    if not (gap > 0):
        raise AssertionError("gap must be > 0")
    _INTEGRAL = ("tinyint", "smallint", "int", "bigint")
    dtypes = dict(stream.dtypes)
    for attr in (id_attr, key_attr, ts_attr):
        if dtypes.get(attr) not in _INTEGRAL:
            raise TypeError(
                f"streaming_sessionize requires integral id/key/ts columns; "
                f"{attr!r} is {dtypes.get(attr)!r} — cast it (or map string "
                f"keys to a surrogate id) before sessionizing"
            )
    keyed = stream.where(
        F.col(ts_attr).isNotNull() & F.col(key_attr).isNotNull()
    ).select(
        F.col(id_attr).cast("long").alias("_id"),
        F.col(key_attr).cast("long").alias("_k"),
        F.col(ts_attr).cast("long").alias("_ts"),
    )
    return keyed.groupBy("_k").applyInPandasWithState(
        _make_kernel(int(gap)),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def session_stats_closed_replay(
    df: DataFrame, id_attr: str, key_attr: str, ts_attr: str, gap: int
) -> DataFrame:
    """Batch replay of ``streaming_sessionize``: the exact closed-session
    table the streaming query emits after consuming ``df`` in per-key
    (ts, id) order — i.e. the batch ``session_stats`` minus each key's
    LAST (still-open) session. Shares the batch operator's plan (one
    window shuffle + one agg) plus one per-key max; used by the
    equivalence pytest and as the driver-oracle form of this surface."""
    from ..operators.sessionize import session_stats

    s = session_stats(df, id_attr, key_attr, ts_attr, gap)
    from pyspark.sql import Window

    w = Window.partitionBy(key_attr)
    return (
        s.withColumn("_max_si", F.max("session_index").over(w))
        .where(F.col("session_index") < F.col("_max_si"))
        .select(
            F.col(key_attr).cast("long").alias("key"),
            "session_index",
            "session_start",
            "session_end",
            "n_events",
            "duration",
        )
    )
