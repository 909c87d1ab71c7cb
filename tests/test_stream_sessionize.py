"""Streaming sessionization: closed sessions must match the batch replay,
state must survive across micro-batches and query restarts."""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from py_stringsimjoin_spark.streaming.stream_sessionize import (
    session_stats_closed_replay,
    streaming_sessionize,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.LongType()),
    ]
)


def _write_batch(src, name, rows):
    ids, uids, tss = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "user_id": pa.array(uids, pa.int64()),
                "ts": pa.array(tss, pa.int64()),
            }
        ),
        os.path.join(src, name),
    )


def _run_once(spark, src, ckpt, sink):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_sessionize(stream, "event_id", "user_id", "ts", 10)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return {
        (r.key, r.session_index): (
            r.session_start, r.session_end, r.n_events, r.duration
        )
        for r in spark.read.parquet(sink).collect()
    }


def _replay(spark, rows):
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long")
    return {
        (r.key, r.session_index): (
            r.session_start, r.session_end, r.n_events, r.duration
        )
        for r in session_stats_closed_replay(
            df, "event_id", "user_id", "ts", 10
        ).collect()
    }


def test_closed_sessions_match_replay_across_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "out")

    # per-key in-order batches (the operator's replay assumption)
    rng = random.Random(3)
    b1, b2, eid = [], [], 0
    for uid in range(4):
        ts = 0
        evs = []
        for _ in range(rng.randint(4, 12)):
            ts += rng.choice([1, 3, 8, 15, 40])
            evs.append(ts)
        cut = len(evs) // 2
        for t in evs[:cut]:
            b1.append((eid, uid, t)); eid += 1
        for t in evs[cut:]:
            b2.append((eid, uid, t)); eid += 1

    _write_batch(src, "b1.parquet", b1)
    got1 = _run_once(spark, src, ckpt, sink)
    assert got1 == _replay(spark, b1)

    # restart on the same checkpoint with a second batch: sessions that
    # SPAN the batch boundary must close exactly once, with merged counts
    _write_batch(src, "b2.parquet", b2)
    got2 = _run_once(spark, src, ckpt, sink)
    assert got2 == _replay(spark, b1 + b2)


def test_null_rows_dropped(spark, tmp_path):
    src = str(tmp_path / "in2")
    os.makedirs(src, exist_ok=True)
    rows = [(1, 1, 0), (2, 1, 100), (3, None, 5), (4, 1, None)]
    _write_batch(src, "b.parquet", rows)
    got = _run_once(
        spark, src, str(tmp_path / "ck2"), str(tmp_path / "out2")
    )
    # events 0 and 100 for user 1: first session closes when the second
    # arrives; nulls contribute nothing
    assert got == {(1, 0): (0, 0, 1, 0)}
