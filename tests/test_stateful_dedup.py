"""Stateful streaming exact dedup: state must survive across micro-batches
AND across query restarts on the same checkpoint (exactly-once semantics)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from py_stringsimjoin_spark.streaming.stateful_dedup import streaming_exact_dedup


def _write_batch(src, name, rows):
    ids, texts = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(src, name),
    )

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _run_once(spark, src, ckpt, sink):
    """One availableNow pass with a restart-capable parquet sink; returns
    ALL rows written to the sink so far, keyed by id."""
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_exact_dedup(stream, "doc_id", "text")
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
    return {r["id"]: r for r in spark.read.parquet(sink).collect()}


def test_first_seen_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_batch(src, "b1.parquet", [(1, "alpha"), (2, "alpha"), (3, "beta"), (4, None)])
    got1 = _run_once(spark, src, ckpt, str(tmp_path / "out"))

    assert not got1[1]["is_duplicate"] and got1[1]["canonical_id"] == 1
    assert got1[2]["is_duplicate"] and got1[2]["canonical_id"] == 1
    assert got1[2]["n_seen_before"] == 1
    assert not got1[3]["is_duplicate"] and got1[3]["canonical_id"] == 3
    # NULL text passes through un-deduplicated
    assert not got1[4]["is_duplicate"] and got1[4]["fingerprint"] is None

    # second run, SAME checkpoint, only new files: state must persist, so
    # "alpha" arriving again is a duplicate of id 1 from the PREVIOUS run
    _write_batch(src, "b2.parquet", [(5, "alpha"), (6, "gamma")])
    got2 = _run_once(spark, src, ckpt, str(tmp_path / "out"))

    assert set(got2) == {1, 2, 3, 4, 5, 6}  # batch 1 rows written once, not re-emitted
    assert got2[5]["is_duplicate"] and got2[5]["canonical_id"] == 1
    assert got2[5]["n_seen_before"] == 2
    assert not got2[6]["is_duplicate"] and got2[6]["canonical_id"] == 6


def test_within_batch_tie_breaks_by_id(spark, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    _write_batch(src, "b1.parquet", [(30, "x"), (10, "x"), (20, "x")])
    got = _run_once(spark, src, ckpt, str(tmp_path / "out"))
    assert not got[10]["is_duplicate"]
    assert got[20]["is_duplicate"] and got[20]["canonical_id"] == 10
    assert got[30]["is_duplicate"] and got[30]["canonical_id"] == 10
    assert [got[i]["n_seen_before"] for i in (10, 20, 30)] == [0, 1, 2]


def test_batch_replay_equivalence(spark, tmp_path):
    """exact_dedup_replay == the streaming query fed the same records in
    ascending-id micro-batches, row for row."""
    from py_stringsimjoin_spark.streaming.stateful_dedup import exact_dedup_replay

    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    rows1 = [(1, "alpha"), (2, "alpha"), (3, "beta"), (4, None)]
    rows2 = [(5, "alpha"), (6, "gamma"), (7, "beta"), (8, None)]
    _write_batch(src, "b1.parquet", rows1)
    got_stream = _run_once(spark, src, ckpt, str(tmp_path / "out"))
    _write_batch(src, "b2.parquet", rows2)
    got_stream = _run_once(spark, src, ckpt, str(tmp_path / "out"))

    batch = spark.createDataFrame(list(rows1 + rows2), SCHEMA)
    got_batch = {r["id"]: r for r in exact_dedup_replay(batch, "doc_id", "text").collect()}

    assert set(got_batch) == set(got_stream)
    for i in got_batch:
        assert got_batch[i].asDict() == got_stream[i].asDict(), i
