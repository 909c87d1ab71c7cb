"""Streaming MinHash-LSH near-dup detection vs its batch twin.

The strong assertion: a stream row must land in EXACTLY the LSH buckets its
batch twin would (band_bucket_exprs is shared), so stream-static candidates
must equal the cross-side subset of batch minhash_lsh_pairs run on the
union of corpus + stream docs.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_stringsimjoin_spark.functions.tokenizers import ShingleTokenizer
from py_stringsimjoin_spark.operators.dedup import minhash_lsh_pairs
from py_stringsimjoin_spark.streaming.stream_dedup import (
    build_static_lsh_index,
    stream_neardup_candidates,
    stream_neardup_matches,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "spark structured streaming joins a stream against a static table"),
    (3, "minhash locality sensitive hashing buckets similar documents together"),
    (4, "an entirely unrelated recipe for sourdough bread with rye flour"),
]
# stream ids are offset so union ids stay disjoint
_STREAM = [
    (101, "the quick brown fox jumps over the lazy dog near the river bed"),
    (102, "minhash locality sensitive hashing buckets similar documents nearby"),
    (103, "completely novel text sharing no shingles with anything indexed"),
]

_TOK = ShingleTokenizer(n=2)


def _run_stream(spark, tmp_path, fn):
    src = str(tmp_path / "incoming")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(_STREAM, SCHEMA).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = fn(stream)
    name = f"sink_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(120)
        return spark.sql(f"select * from {name}").collect()
    finally:
        q.stop()


def test_stream_candidates_equal_batch_cross_pairs(spark, tmp_path):
    corpus = spark.createDataFrame(_CORPUS, SCHEMA)
    idx = build_static_lsh_index(corpus, "doc_id", "text", _TOK, 32, 8)

    rows = _run_stream(
        spark, tmp_path,
        lambda s: stream_neardup_candidates(s, idx, "doc_id", "text", _TOK, 32, 8),
    )
    got = {(r["_l_key"], r["_r_key"]) for r in rows}

    # batch twin: union both sides, keep only cross-side bucket collisions
    union = spark.createDataFrame(_CORPUS + _STREAM, SCHEMA)
    batch = minhash_lsh_pairs(union, "doc_id", "text", _TOK, 32, 8)
    exp = {
        (r["r_id"], r["l_id"])  # l<r in batch output → stream id is r_id
        for r in batch.collect()
        if r["l_id"] <= 100 < r["r_id"]
    }
    assert got == exp
    assert got, "fixture should produce at least one cross-side candidate"
    # the novel doc shares no shingles, so it cannot collide
    assert all(l != 103 for l, _ in got)


def test_stream_matches_threshold_vs_bruteforce(spark, tmp_path):
    corpus = spark.createDataFrame(_CORPUS, SCHEMA)
    idx = build_static_lsh_index(corpus, "doc_id", "text", _TOK, 32, 8)
    threshold = 0.5

    rows = _run_stream(
        spark, tmp_path,
        lambda s: stream_neardup_matches(
            s, corpus, idx, "doc_id", "text", threshold, _TOK, 32, 8
        ),
    )
    got = {(r["_l_key"], r["_r_key"]): r["_sim_score"] for r in rows}

    def shingles(t):
        return set(_TOK.tokenize(t))

    for (l, r), score in got.items():
        lt = shingles(dict(_STREAM)[l])
        rt = shingles(dict(_CORPUS)[r])
        exact = len(lt & rt) / len(lt | rt)
        assert score == pytest.approx(exact)
        assert exact >= threshold
    # every brute-force pair ≥ threshold that ALSO collides in LSH is present
    cand_rows = _run_stream(
        spark, tmp_path,
        lambda s: stream_neardup_candidates(s, idx, "doc_id", "text", _TOK, 32, 8),
    )
    for l, r in {(c["_l_key"], c["_r_key"]) for c in cand_rows}:
        lt = shingles(dict(_STREAM)[l])
        rt = shingles(dict(_CORPUS)[r])
        exact = len(lt & rt) / len(lt | rt)
        if exact >= threshold:
            assert (l, r) in got
