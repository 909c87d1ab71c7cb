import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
from py_stringsimjoin_spark.streaming.stream_join import (
    build_static_index,
    stream_candidates,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_stream_static_candidates(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            ("u1", "deep learning for entity resolution"),
            ("u2", "spark sql query optimization"),
            ("u3", "completely different topic words"),
        ],
        SCHEMA,
    )
    _, prefix, _ = build_static_index(
        corpus, "url", "text", WhitespaceTokenizer(), "jaccard", 0.4
    )
    # stream source: a directory of parquet files
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    spark.createDataFrame(
        [
            ("s1", "deep learning for entity matching"),
            ("s2", "unrelated totally novel content"),
        ],
        SCHEMA,
    ).write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    cand = stream_candidates(
        stream, prefix, "url", "text", WhitespaceTokenizer(), "jaccard", 0.4
    )
    q = (
        cand.writeStream.format("memory")
        .queryName("cand_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r["_l_key"], r["_r_key"])
            for r in spark.sql("select * from cand_sink").collect()
        }
    finally:
        q.stop()
    assert ("s1", "u1") in rows  # 4 shared tokens of 5/5 → candidate
    assert all(l != "s2" for l, _ in rows)  # s2 shares nothing
