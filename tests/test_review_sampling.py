"""Stratified review sampling: banding, per-band limit, determinism."""

from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.evaluation import sample_pairs_for_review


def _mk(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("l"),
        (F.col("id") + 1000).alias("r"),
        ((F.col("id") % 100).cast("double") / 100.0).alias("score"),
    )


def test_banding_and_limits(spark):
    pairs = _mk(spark)
    out = sample_pairs_for_review(pairs, "l", "r", "score", [0.25, 0.5, 0.75], 10)
    rows = out.collect()
    by_band = {}
    for x in rows:
        by_band.setdefault(x.band, []).append(x)
    assert set(by_band) == {0, 1, 2, 3}
    for b, xs in by_band.items():
        assert len(xs) == 10
        assert sorted(x._rn for x in xs) == list(range(1, 11))
        for x in xs:
            lo = [0.0, 0.25, 0.5, 0.75][b]
            hi = [0.25, 0.5, 0.75, 1.01][b]
            assert lo <= x.score < hi or (b == 3 and x.score >= 0.75)


def test_edge_scores_go_to_upper_band(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0.5), (3, 4, 0.4999)], ["l", "r", "score"]
    )
    out = {r.l: r.band for r in sample_pairs_for_review(
        pairs, "l", "r", "score", [0.5], 5).collect()}
    assert out == {1: 1, 3: 0}


def test_deterministic_across_partitionings(spark):
    pairs = _mk(spark)
    a = sample_pairs_for_review(pairs, "l", "r", "score", [0.5], 7).collect()
    b = sample_pairs_for_review(
        pairs.repartition(13), "l", "r", "score", [0.5], 7
    ).collect()
    key = lambda r: (r.band, r._rn, r.l, r.r)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_rejects_unsorted_edges(spark):
    pairs = _mk(spark, 10)
    try:
        sample_pairs_for_review(pairs, "l", "r", "score", [0.8, 0.2], 5)
        raise AssertionError("expected AssertionError")
    except AssertionError as e:
        assert "ascending" in str(e)
