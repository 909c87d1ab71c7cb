"""nmi_metrics vs an independent contingency-free mirror.

The mirror computes MI/H from raw label lists with collections.Counter and
math.log — no DataFrames, no shared formula plumbing.
"""

import math
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.evaluation import nmi_metrics


def brute(rows):
    rows = [(c, t) for _, c, t in rows if c is not None and t is not None]
    n = len(rows)
    if n == 0:
        return (None, None, None, None, 0)
    nc = Counter(c for c, _ in rows)
    nt = Counter(t for _, t in rows)
    nct = Counter(rows)
    mi = sum(
        (v / n) * math.log(n * v / (nc[c] * nt[t]))
        for (c, t), v in nct.items()
    )
    hc = -sum((v / n) * math.log(v / n) for v in nc.values())
    ht = -sum((v / n) * math.log(v / n) for v in nt.values())
    if len(nc) == 1 and len(nt) == 1:
        nmi = 1.0
    elif (hc + ht) / 2 == 0.0:
        nmi = 0.0
    else:
        nmi = mi / ((hc + ht) / 2)
    return (nmi, mi, hc, ht, n)


def check(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k int, c string, t string")
    got = nmi_metrics(df, "k", "c", "t", **kw).first()
    nmi, mi, hc, ht, n = brute(rows)
    assert got["n_records"] == n
    for name, want in [("nmi", nmi), ("mutual_info", mi),
                       ("entropy_pred", hc), ("entropy_true", ht)]:
        if want is None:
            assert got[name] is None
        else:
            assert got[name] == pytest.approx(want, abs=1e-12), name


def test_perfect_agreement(spark):
    rows = [(i, f"c{i % 3}", f"t{i % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "k int, c string, t string")
    assert nmi_metrics(df, "k", "c", "t").first()["nmi"] == pytest.approx(1.0)
    check(spark, rows)


def test_conventions(spark):
    # both trivial -> 1.0; one side trivial -> 0.0; nulls excluded
    both = [(i, "a", "x") for i in range(4)]
    df = spark.createDataFrame(both, "k int, c string, t string")
    assert nmi_metrics(df, "k", "c", "t").first()["nmi"] == 1.0
    one_side = [(0, "a", "x"), (1, "a", "y"), (2, "a", "x")]
    df = spark.createDataFrame(one_side, "k int, c string, t string")
    r = nmi_metrics(df, "k", "c", "t").first()
    assert r["nmi"] == 0.0 and r["mutual_info"] == pytest.approx(0.0)
    check(spark, [(0, "a", "x"), (1, None, "x"), (2, "b", None)])


def test_randomized_vs_brute_both_fold_modes(spark):
    import random

    rng = random.Random(5)
    for trial in range(3):
        rows = [
            (i, f"c{rng.randrange(4)}", f"t{rng.randrange(3)}")
            for i in range(rng.randrange(2, 40))
        ]
        check(spark, rows)
        check(spark, rows, exact_order=True)
