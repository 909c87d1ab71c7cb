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


class TestBcubed:
    def _run(self, spark, rows, **kw):
        from py_stringsimjoin_spark.operators.evaluation import bcubed_metrics

        df = spark.createDataFrame(rows, ["k", "pred", "true"])
        return bcubed_metrics(df, "k", "pred", "true", **kw).collect()[0]

    def test_perfect_clustering(self, spark):
        rows = [(1, "a", "x"), (2, "a", "x"), (3, "b", "y")]
        r = self._run(spark, rows)
        assert r["bcubed_precision"] == 1.0
        assert r["bcubed_recall"] == 1.0
        assert r["bcubed_f1"] == 1.0
        assert r["n_records"] == 3

    def test_hand_computed(self, spark):
        # pred: {1,2,3} as "a", {4} as "b"; true: {1,2} as "x", {3,4} as "y"
        # P(1)=P(2)=2/3, P(3)=1/3, P(4)=1 -> precision = (2/3+2/3+1/3+1)/4 = 2/3
        # R(1)=R(2)=2/2=1, R(3)=1/2, R(4)=1/2 -> recall = (1+1+.5+.5)/4 = 3/4
        rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "b", "y")]
        r = self._run(spark, rows)
        import pytest as _pt

        assert r["bcubed_precision"] == _pt.approx(2 / 3, abs=1e-12)
        assert r["bcubed_recall"] == _pt.approx(3 / 4, abs=1e-12)
        p, q = 2 / 3, 3 / 4
        assert r["bcubed_f1"] == _pt.approx(2 * p * q / (p + q), abs=1e-12)

    def test_singletons_counted(self, spark):
        # everything singleton-pred vs one big true cluster:
        # precision 1.0, recall 1/n each
        rows = [(i, f"p{i}", "x") for i in range(5)]
        r = self._run(spark, rows)
        assert r["bcubed_precision"] == 1.0
        assert r["bcubed_recall"] == 0.2

    def test_null_assignments_excluded(self, spark):
        rows = [(1, "a", "x"), (2, "a", "x"), (3, None, "x"), (4, "a", None)]
        r = self._run(spark, rows)
        assert r["n_records"] == 2
        assert r["bcubed_precision"] == 1.0

    def test_exact_order_matches_fast_path(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (i, f"p{rng.randint(0, 9)}", f"t{rng.randint(0, 5)}")
            for i in range(200)
        ]
        fast = self._run(spark, rows)
        exact = self._run(spark, rows, exact_order=True)
        import pytest as _pt

        for col in ("bcubed_precision", "bcubed_recall", "bcubed_f1"):
            assert fast[col] == _pt.approx(exact[col], abs=1e-12)
        assert fast["n_records"] == exact["n_records"] == 200

    def test_empty_input(self, spark):
        from py_stringsimjoin_spark.operators.evaluation import bcubed_metrics

        df = spark.createDataFrame([], "k int, pred string, true string")
        r = bcubed_metrics(df, "k", "pred", "true").collect()[0]
        assert r["bcubed_precision"] is None
        assert r["bcubed_f1"] is None
        assert r["n_records"] in (0, None)
