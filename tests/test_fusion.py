"""RRF fusion vs a direct python mirror + expr-vs-numpy dense top-k parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.ann import brute_force_topk, expr_cosine_topk
from py_stringsimjoin_spark.operators.fusion import rrf_fuse


def _mk_list(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "neighbor_id", "rank"])


def test_rrf_matches_mirror(spark):
    rng = np.random.RandomState(4)
    lists = []
    raw = []
    for _ in range(3):
        rows = []
        for q in range(5):
            perm = rng.permutation(20)[:8]
            rows += [(q, int(x), r + 1) for r, x in enumerate(perm)]
        raw.append(rows)
        lists.append(_mk_list(spark, rows))
    got = {
        (r["query_id"], r["neighbor_id"]): (r["n_lists"], r["score"], r["rank"])
        for r in rrf_fuse(lists, k=6).collect()
    }
    # mirror: ascending-sorted fold, (score desc, id asc) rank
    acc = {}
    for rows in raw:
        for q, x, r in rows:
            acc.setdefault((q, x), []).append(1.0 / (60.0 + r))
    import math
    scores = {}
    for key, cs in acc.items():
        s = 0.0
        for c in sorted(cs):
            s += c
        scores[key] = (len(cs), s)
    exp = {}
    for q in range(5):
        cand = sorted(
            ((x, nl, s) for (qq, x), (nl, s) in scores.items() if qq == q),
            key=lambda t: (-t[2], t[0]),
        )[:6]
        for rank, (x, nl, s) in enumerate(cand, 1):
            exp[(q, x)] = (nl, s, rank)
    assert got == exp


def test_rrf_validation(spark):
    with pytest.raises(AssertionError):
        rrf_fuse([], k=3)
    l1 = _mk_list(spark, [(0, 1, 1)])
    with pytest.raises(AssertionError):
        rrf_fuse([l1], k=0)
    with pytest.raises(AssertionError):
        rrf_fuse([l1], k=3, rrf_k=0.0)


def test_expr_topk_matches_bruteforce(spark):
    rng = np.random.RandomState(9)
    X = rng.randn(40, 6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    queries = df.where(F.col("vec_id") < 3)
    a = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in expr_cosine_topk(df, queries, k=5).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    assert a == b


def test_hybrid_rrf_prefers_consensus(spark):
    """A doc ranked #1 by both lists must out-score one ranked #1 by one
    list only (1/(60+1)*2 > 1/61 + anything smaller is irrelevant)."""
    l1 = _mk_list(spark, [(0, 10, 1), (0, 11, 2)])
    l2 = _mk_list(spark, [(0, 10, 1), (0, 12, 2)])
    out = {r["neighbor_id"]: r["rank"] for r in rrf_fuse([l1, l2], k=3).collect()}
    assert out[10] == 1
