"""vi_metrics vs an independent contingency-free mirror (Counter + math.log,
no DataFrames) — VI = H(C)+H(T)−2·MI, NVI = VI/ln n, Meilă 2007."""

import math
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.evaluation import vi_metrics


def brute(rows):
    rows = [(c, t) for _, c, t in rows if c is not None and t is not None]
    n = len(rows)
    if n == 0:
        return (None, None, None, None, None, 0)
    nc = Counter(c for c, _ in rows)
    nt = Counter(t for _, t in rows)
    nct = Counter(rows)
    mi = sum(
        (v / n) * math.log(n * v / (nc[c] * nt[t]))
        for (c, t), v in nct.items()
    )
    hc = -sum((v / n) * math.log(v / n) for v in nc.values())
    ht = -sum((v / n) * math.log(v / n) for v in nt.values())
    vi = hc + ht - 2 * mi
    nvi = vi / math.log(n) if n > 1 else None
    return (vi, nvi, mi, hc, ht, n)


def check(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k int, c string, t string")
    got = vi_metrics(df, "k", "c", "t", **kw).first()
    vi, nvi, mi, hc, ht, n = brute(rows)
    assert got["n_records"] == n
    for name, want in [("vi", vi), ("nvi", nvi), ("mutual_info", mi),
                       ("entropy_pred", hc), ("entropy_true", ht)]:
        if want is None:
            assert got[name] is None, name
        else:
            assert got[name] == pytest.approx(want, abs=1e-12), name


def test_identical_partitions_vi_zero(spark):
    rows = [(i, f"c{i % 3}", f"t{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "k int, c string, t string")
    r = vi_metrics(df, "k", "c", "t").first()
    assert r["vi"] == pytest.approx(0.0, abs=1e-12)
    assert r["nvi"] == pytest.approx(0.0, abs=1e-12)
    check(spark, rows)


def test_conventions(spark):
    # empty -> NULLs; n == 1 -> vi 0, nvi NULL; NULL labels excluded
    empty = vi_metrics(
        spark.createDataFrame([], "k int, c string, t string"), "k", "c", "t"
    ).first()
    assert empty["vi"] is None and empty["n_records"] == 0
    single = vi_metrics(
        spark.createDataFrame([(0, "a", "x")], "k int, c string, t string"),
        "k", "c", "t",
    ).first()
    assert single["vi"] == pytest.approx(0.0) and single["nvi"] is None
    check(spark, [(0, "a", "x"), (1, None, "x"), (2, "b", None)])


def test_metric_symmetry(spark):
    """VI is symmetric in the two partitions (H(C)+H(T)−2MI is)."""
    rows = [(i, f"c{i % 4}", f"t{i % 3}") for i in range(24)]
    df = spark.createDataFrame(rows, "k int, c string, t string")
    a = vi_metrics(df, "k", "c", "t").first()["vi"]
    b = vi_metrics(df, "k", "t", "c").first()["vi"]
    assert a == pytest.approx(b, abs=1e-12)


def test_randomized_vs_brute_both_fold_modes(spark):
    import random

    rng = random.Random(11)
    for trial in range(3):
        rows = [
            (i, f"c{rng.randrange(4)}", f"t{rng.randrange(3)}")
            for i in range(rng.randrange(2, 40))
        ]
        check(spark, rows)
        check(spark, rows, exact_order=True)
