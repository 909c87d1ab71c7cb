"""v_measure_metrics vs an independent Counter/ math.log mirror (the
Rosenberg–Hirschberg definitions written directly, sharing no plumbing
with the operator)."""

import math
import random
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.evaluation import v_measure_metrics


def brute(rows):
    rows = [(c, t) for _, c, t in rows if c is not None and t is not None]
    n = len(rows)
    if n == 0:
        return (None, None, None, 0)
    nc = Counter(c for c, _ in rows)
    nt = Counter(t for _, t in rows)
    nct = Counter(rows)
    mi = sum(
        (v / n) * math.log(n * v / (nc[c] * nt[t])) for (c, t), v in nct.items()
    )
    hc = -sum((v / n) * math.log(v / n) for v in nc.values())
    ht = -sum((v / n) * math.log(v / n) for v in nt.values())
    hom = 1.0 if len(nt) == 1 else mi / ht
    com = 1.0 if len(nc) == 1 else mi / hc
    v = 0.0 if hom + com == 0.0 else 2 * hom * com / (hom + com)
    return (hom, com, v, n)


def check(spark, rows):
    df = spark.createDataFrame(rows, "k int, c string, t string")
    got = v_measure_metrics(df, "k", "c", "t").first()
    hom, com, v, n = brute(rows)
    assert got["n_records"] == n
    for name, want in [("homogeneity", hom), ("completeness", com),
                       ("v_measure", v)]:
        if want is None:
            assert got[name] is None
        else:
            assert got[name] == pytest.approx(want, abs=1e-12), name


def test_perfect_and_trivial(spark):
    check(spark, [(i, f"c{i % 3}", f"t{i % 3}") for i in range(9)])
    check(spark, [(i, "a", "x") for i in range(4)])          # both trivial
    check(spark, [(i, "a", f"t{i}") for i in range(4)])      # over-merged
    check(spark, [(i, f"c{i}", "x") for i in range(4)])      # over-split


def test_nulls_and_empty(spark):
    rows = [(1, "a", "x"), (2, None, "x"), (3, "b", None), (4, "b", "y")]
    check(spark, rows)
    got = v_measure_metrics(
        spark.createDataFrame([], "k int, c string, t string"), "k", "c", "t"
    ).first()
    assert got["v_measure"] is None and got["n_records"] == 0


def test_random_vs_brute(spark):
    rng = random.Random(5)
    rows = [
        (i, f"c{rng.randint(0, 5)}", f"t{rng.randint(0, 3)}") for i in range(200)
    ]
    check(spark, rows)
    # exact_order path agrees with itself and the mirror
    df = spark.createDataFrame(rows, "k int, c string, t string")
    a = v_measure_metrics(df, "k", "c", "t", exact_order=True).first()
    hom, com, v, n = brute(rows)
    assert a["v_measure"] == pytest.approx(v, abs=1e-12)


def test_asymmetry(spark):
    # over-merging hurts homogeneity more than completeness
    rows = [(i, "c0", f"t{i % 4}") for i in range(8)] + [
        (8 + i, f"c{1 + i}", f"t{i % 4}") for i in range(4)
    ]
    got = v_measure_metrics(
        spark.createDataFrame(rows, "k int, c string, t string"), "k", "c", "t"
    ).first()
    assert got["homogeneity"] < got["completeness"]
