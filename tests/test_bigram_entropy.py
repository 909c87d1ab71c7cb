"""bigram_cross_entropy vs a direct python mirror (bit-exact op order)."""

import math
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.textstats import bigram_cross_entropy

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat"),
    (2, "on the mat the cat"),
    (3, "single"),
    (4, ""),
    (5, None),
    (6, "the the the the"),
    (7, "MAT the Cat"),  # lowercased by _words
]


def _mirror(docs, lam):
    uni, big = Counter(), Counter()
    for _, t in docs:
        if t is None:
            continue
        toks = t.lower().split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    N = sum(uni.values())
    out = {}
    for i, t in docs:
        if t is None:
            out[i] = (0, None)
            continue
        toks = t.lower().split()
        if len(toks) < 2:
            out[i] = (0, None)
            continue
        lps = []
        for a, b in zip(toks, toks[1:]):
            p = lam * (big[(a, b)] / float(uni[a])) + (1.0 - lam) * (
                uni[b] / float(N)
            )
            lps.append(math.log(p) / math.log(2.0))
        s = 0.0
        for v in sorted(lps):
            s += v
        out[i] = (len(lps), -s / float(len(lps)))
    return out


def _mirror_probs(docs, lam):
    uni, big = Counter(), Counter()
    for _, t in docs:
        if t is None:
            continue
        toks = t.lower().split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    N = sum(uni.values())
    out = {}
    for i, t in docs:
        toks = t.lower().split() if t is not None else []
        if len(toks) < 2:
            out[i] = (0, None)
            continue
        ps = [
            lam * (big[(a, b)] / float(uni[a]))
            + (1.0 - lam) * (uni[b] / float(N))
            for a, b in zip(toks, toks[1:])
        ]
        s = 0.0
        for v in sorted(ps):
            s += v
        out[i] = (len(ps), s / float(len(ps)))
    return out


@pytest.mark.parametrize("lam", [0.75, 1.0, 0.0])
def test_matches_mirror(spark, lam):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in bigram_cross_entropy(df, "doc_id", "text", lam=lam).collect()
    }
    exp = _mirror(DOCS, lam)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        if exp[i][1] is None:
            assert got[i][1] is None, i
        else:
            # 1e-12, not bit-exact: Java Math.log vs libm can differ 1 ulp
            assert got[i][1] == pytest.approx(exp[i][1], rel=1e-12), i


@pytest.mark.parametrize("lam", [0.75, 0.5])
def test_mean_prob_matches_mirror_exactly(spark, lam):
    """kind="mean_prob" (the driver-oracle form) is log-free and must be
    bit-exact vs the same-op-order mirror."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_prob"])
        for r in bigram_cross_entropy(
            df, "doc_id", "text", lam=lam, kind="mean_prob"
        ).collect()
    }
    exp = _mirror_probs(DOCS, lam)
    assert got == exp


def test_order_sensitivity(spark):
    """Bag-identical docs with different word order separate at the
    bigram level (the whole point vs unigram_cross_entropy)."""
    rows = [(0, "a b a b a b"), (1, "a a a b b b")] + [
        (i, "a b a b a b") for i in range(2, 12)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["cross_entropy"]
        for r in bigram_cross_entropy(df, "doc_id", "text").collect()
    }
    assert got[1] > got[0]  # the rare-order doc is more surprising


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(AssertionError):
        bigram_cross_entropy(df, "doc_id", "text", lam=1.5)
