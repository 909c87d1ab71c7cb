"""cluster_stats / hard_negatives vs brute-force Python mirrors."""

import random
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.cluster_stats import (
    cluster_stats,
    hard_negatives,
)


def test_cluster_stats(spark):
    rng = random.Random(3)
    rows = [(i, rng.choice([None, "a", "b", "c", "d", "e"])) for i in range(60)]
    got = {
        r.cluster_size: r
        for r in cluster_stats(
            spark.createDataFrame(rows, "k long, c string"), "k", "c"
        ).collect()
    }
    sizes = Counter(c for _, c in rows if c is not None)
    hist = Counter(sizes.values())
    tc, tr = len(sizes), sum(sizes.values())
    assert set(got) == set(hist)
    for s, n in hist.items():
        r = got[s]
        assert r.n_clusters == n and r.n_records == s * n
        assert r.frac_clusters == n / tc
        assert r.frac_records == (s * n) / tr


def _brute_negatives(scored, labels, k, symmetric):
    pos = set(labels)
    if symmetric:
        pos |= {(b, a) for a, b in labels}
    out = {}
    for l, r, s in scored:
        if s is None or (l, r) in pos:
            continue
        out.setdefault(l, []).append((-s, r))
    res = {}
    for l, cands in out.items():
        for rank, (ns, r) in enumerate(sorted(cands)[:k], 1):
            res[(l, r)] = (-ns, rank)
    return res


@pytest.mark.parametrize("symmetric", [False, True])
def test_hard_negatives(spark, symmetric):
    rng = random.Random(9)
    scored = [
        (l, r, rng.choice([None, round(rng.random(), 6)]))
        for l in range(10)
        for r in rng.sample(range(50), 12)
    ]
    labels = [(l, r) for l, r, _ in scored if rng.random() < 0.3]
    sdf = spark.createDataFrame(scored, "l long, r long, score double")
    ldf = spark.createDataFrame(labels or [(99, 99)], "l long, r long")
    got = hard_negatives(
        sdf, ldf, "l", "r", "score", 3, symmetric=symmetric
    ).collect()
    want = _brute_negatives(scored, labels or [(99, 99)], 3, symmetric)
    assert {(r.l, r.r): (r.score, r.rank) for r in got} == want


def test_random_negative_pairs(spark):
    import hashlib

    keys = [3, 7, 11, 20, 21, 40, 55]
    df = spark.createDataFrame([(x,) for x in keys] + [(None,), (7,)], "k long")
    got = {(r.l_k, r.draw): r.r_k
           for r in __import__("py_stringsimjoin_spark").random_negative_pairs(
               df, "k", 3).collect()}
    sk = sorted(keys)
    rank = {x: i for i, x in enumerate(sk)}
    n = len(sk)
    want = {}
    for x in keys:
        for j in range(3):
            h = int(hashlib.md5(f"neg|{x}|{j}".encode()).hexdigest()[:15], 16)
            p = h % (n - 1)
            if p >= rank[x]:
                p += 1
            want[(x, j)] = sk[p]
    assert got == want
    # l != r always; exactly N*k rows
    assert all(l != r for (l, _), r in got.items())
    assert len(got) == len(keys) * 3


def test_random_negative_pairs_tiny(spark):
    # a single record has no possible partner -> empty output, no crash
    df = spark.createDataFrame([(1,)], "k long")
    from py_stringsimjoin_spark import random_negative_pairs
    assert random_negative_pairs(df, "k", 2).count() == 0


def test_hard_negatives_validation(spark):
    sdf = spark.createDataFrame([(1, 2, 0.5)], "l long, r long, score double")
    ldf = spark.createDataFrame([(1, 2)], "l long, r long")
    with pytest.raises(AssertionError):
        hard_negatives(sdf, ldf, "l", "r", "score", 0)
    with pytest.raises(AssertionError):
        hard_negatives(sdf, ldf, "l", "r", "nope", 1)
