"""Streaming canonical-URL recrawl dedup: the URL-normalization expression
composes with the stateful first-seen dedup kernel — recrawled disguises of
one resource collapse across micro-batches."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from py_stringsimjoin_spark.functions.urls import normalize_url_expr
from py_stringsimjoin_spark.streaming.stateful_dedup import streaming_exact_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
    ]
)


def _write_batch(src, name, rows):
    ids, urls = zip(*rows)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
        }),
        os.path.join(src, name),
    )


def test_streaming_url_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)

    _write_batch(src, "b1.parquet", [
        (1, "https://WWW.Example.COM/a/?utm_source=t"),
        (2, "https://other.org/z"),
    ])
    _write_batch(src, "b2.parquet", [
        (3, "http://example.com:80/a"),      # http != https -> NOT a dup of 1
        (4, "https://example.com/a"),        # canonical dup of 1
        (5, "https://user@other.org/z#f"),   # canonical dup of 2
    ])

    from pyspark.sql import functions as F

    stream = spark.readStream.schema(SCHEMA).parquet(src).withColumn(
        "canon", normalize_url_expr(F.col("url"))
    )
    out = streaming_exact_dedup(stream, "doc_id", "canon")
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
    got = {r["id"]: r for r in spark.read.parquet(sink).collect()}
    assert len(got) == 5
    dups = {i for i, r in got.items() if r["is_duplicate"]}
    assert dups == {4, 5}
    assert got[4]["canonical_id"] == 1
    assert got[5]["canonical_id"] == 2
    assert not got[3]["is_duplicate"]  # scheme difference is a real difference
