"""evaluate_blocking / blocking_metrics vs hand-computed metrics."""

from py_stringsimjoin_spark.operators.evaluation import (
    blocking_metrics,
    evaluate_blocking,
)


def test_evaluate_blocking_basic(spark):
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], ["l_key", "r_key"]
    )
    true = spark.createDataFrame([(1, 2), (4, 5), (6, 7)], ["l_key", "r_key"])
    m = evaluate_blocking(cand, true, n_left=10, n_right=10)
    assert m["n_candidates"] == 4 and m["n_true"] == 3
    assert m["n_true_found"] == 2
    assert m["pairs_completeness"] == 2 / 3
    assert m["pairs_quality"] == 2 / 4
    assert m["reduction_ratio"] == 1.0 - 4 / 100


def test_evaluate_blocking_symmetric(spark):
    # unordered self-join pairs: (b,a) counts as (a,b); dupes collapse
    cand = spark.createDataFrame([(2, 1), (1, 2), (3, 1)], ["l_key", "r_key"])
    true = spark.createDataFrame([(1, 2)], ["l_key", "r_key"])
    m = evaluate_blocking(cand, true, n_left=5, n_right=5, symmetric=True)
    assert m["n_candidates"] == 2 and m["n_true_found"] == 1
    assert m["pairs_completeness"] == 1.0
    assert m["reduction_ratio"] == 1.0 - 2 / 10


def test_evaluate_blocking_empty_truth(spark):
    cand = spark.createDataFrame([(1, 2)], ["l_key", "r_key"])
    true = spark.createDataFrame([], "l_key long, r_key long")
    m = evaluate_blocking(cand, true)
    assert m["pairs_completeness"] is None
    assert m["pairs_quality"] == 0.0
    assert m["reduction_ratio"] is None


def test_blocking_metrics_lazy_matches_eager(spark):
    # the one-plan DataFrame variant agrees with the eager dict version
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], ["l_key", "r_key"]
    )
    true = spark.createDataFrame([(1, 2), (4, 5), (6, 7)], ["l_key", "r_key"])
    tbl = spark.range(10).withColumnRenamed("id", "k")
    row = blocking_metrics(cand, true, ltable=tbl, rtable=tbl).collect()[0]
    eager = evaluate_blocking(cand, true, n_left=10, n_right=10)
    assert row.n_candidates == eager["n_candidates"]
    assert row.n_true == eager["n_true"]
    assert row.n_true_found == eager["n_true_found"]
    assert row.pairs_completeness == eager["pairs_completeness"]
    assert row.pairs_quality == eager["pairs_quality"]
    assert row.reduction_ratio == eager["reduction_ratio"]


def test_blocking_metrics_symmetric_and_nulls(spark):
    cand = spark.createDataFrame([(2, 1), (1, 2), (3, 1)], ["l_key", "r_key"])
    true = spark.createDataFrame([(1, 2)], ["l_key", "r_key"])
    tbl = spark.range(5).withColumnRenamed("id", "k")
    row = blocking_metrics(
        cand, true, ltable=tbl, rtable=tbl, symmetric=True
    ).collect()[0]
    assert row.n_candidates == 2 and row.n_true_found == 1
    assert row.pairs_completeness == 1.0
    assert row.reduction_ratio == 1.0 - 2 / 10
    # no tables -> rr is null; empty truth -> pc null
    empty = spark.createDataFrame([], "l_key long, r_key long")
    row2 = blocking_metrics(cand, empty).collect()[0]
    assert row2.pairs_completeness is None
    assert row2.reduction_ratio is None
