"""rand_metrics vs direct pair enumeration (independent O(n^2) mirror).

The mirror never builds a contingency table: RI counts agreeing pairs
directly, ARI comes from the pair counts via the Hubert-Arabie formula
evaluated in exact rational arithmetic (fractions), so agreement checks the
operator's contingency/decimal formulation against first principles.
"""

from fractions import Fraction
from itertools import combinations

import pytest

from py_stringsimjoin_spark.operators.evaluation import rand_metrics


def brute(rows):
    """rows: (key, pred, true). Returns (ri, ari, n) as floats/None."""
    rows = [(k, c, t) for k, c, t in rows if c is not None and t is not None]
    n = len(rows)
    if n < 2:
        return (None, None, n)
    ss = sd = ds = dd = 0
    for (_, c1, t1), (_, c2, t2) in combinations(rows, 2):
        if c1 == c2 and t1 == t2:
            ss += 1
        elif c1 == c2:
            sd += 1
        elif t1 == t2:
            ds += 1
        else:
            dd += 1
    total = Fraction(n * (n - 1), 2)
    ri = Fraction(ss + dd) / total
    sum_a = Fraction(ss + sd)  # pairs same in pred
    sum_b = Fraction(ss + ds)  # pairs same in true
    e = sum_a * sum_b / total
    denom = (sum_a + sum_b) / 2 - e
    ari = Fraction(1) if denom == 0 else (Fraction(ss) - e) / denom
    return (float(ri), float(ari), n)


def check(spark, rows):
    df = spark.createDataFrame(rows, "k int, c string, t string")
    got = rand_metrics(df, "k", "c", "t").first()
    ri, ari, n = brute(rows)
    assert got["n_records"] == n
    if ri is None:
        assert got["rand_index"] is None and got["adjusted_rand_index"] is None
    else:
        assert got["rand_index"] == pytest.approx(ri, abs=1e-12)
        assert got["adjusted_rand_index"] == pytest.approx(ari, abs=1e-12)


def test_perfect_agreement_is_one(spark):
    rows = [(i, f"c{i % 3}", f"t{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "k int, c string, t string")
    got = rand_metrics(df, "k", "c", "t").first()
    assert got["rand_index"] == 1.0
    assert got["adjusted_rand_index"] == 1.0


def test_known_sklearn_example(spark):
    # sklearn docs: adjusted_rand_score([0,0,1,1],[0,0,1,2]) == 0.5714285714...
    rows = [(0, "0", "0"), (1, "0", "0"), (2, "1", "1"), (3, "1", "2")]
    df = spark.createDataFrame(rows, "k int, c string, t string")
    got = rand_metrics(df, "k", "c", "t").first()
    assert got["adjusted_rand_index"] == pytest.approx(0.5714285714285714)
    check(spark, rows)


def test_trivial_partitions_convention(spark):
    # all singletons in both partitions: denominator 0 -> ARI = 1.0
    rows = [(i, f"c{i}", f"t{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "k int, c string, t string")
    got = rand_metrics(df, "k", "c", "t").first()
    assert got["adjusted_rand_index"] == 1.0 and got["rand_index"] == 1.0


def test_nulls_excluded_and_small_n(spark):
    rows = [(1, "a", "x"), (2, None, "x"), (3, "a", None)]
    check(spark, rows)  # one usable row -> NULL metrics, n_records=1
    check(spark, [(1, "a", "x"), (2, "b", "x"), (3, None, None)])


def test_randomized_vs_brute(spark):
    import random

    rng = random.Random(11)
    for trial in range(4):
        rows = [
            (i, f"c{rng.randrange(4)}", f"t{rng.randrange(3)}")
            for i in range(rng.randrange(2, 40))
        ]
        check(spark, rows)
