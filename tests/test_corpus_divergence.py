"""corpus_divergence vs a direct python mirror."""

import math
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.corpus_divergence import corpus_divergence

A = [(0, "apple banana apple"), (1, "cherry date"), (2, None), (3, "")]
B = [(0, "apple apple apple banana fig"), (1, "grape grape")]


def _mirror(ta, tb):
    ca, cb = Counter(), Counter()
    for _, t in ta:
        if t:
            ca.update(t.lower().split())
    for _, t in tb:
        if t:
            cb.update(t.lower().split())
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    tv_terms, chi_terms, js_terms = [], [], []
    for w in vocab:
        p = ca[w] / float(na)
        q = cb[w] / float(nb)
        m = (p + q) / 2.0
        tv_terms.append(abs(p - q))
        chi_terms.append(((p - m) * (p - m)) / m)
        js = 0.0
        if p > 0:
            js += 0.5 * (p * (math.log(p / m) / math.log(2.0)))
        if q > 0:
            js += 0.5 * (q * (math.log(q / m) / math.log(2.0)))
        js_terms.append(js)

    def fold(vals):
        s = 0.0
        for v in sorted(vals):
            s += v
        return s

    return {
        "tv": 0.5 * fold(tv_terms),
        "chi2": fold(chi_terms),
        "js": fold(js_terms),
        "n_tokens_a": na,
        "n_tokens_b": nb,
        "vocab_a": len(ca),
        "vocab_b": len(cb),
        "vocab_shared": len(set(ca) & set(cb)),
    }


def test_matches_mirror(spark):
    da = spark.createDataFrame(A, ["doc_id", "text"])
    db = spark.createDataFrame(B, ["doc_id", "text"])
    got = corpus_divergence(da, db, "text").first().asDict()
    exp = _mirror(A, B)
    for k in ("n_tokens_a", "n_tokens_b", "vocab_a", "vocab_b", "vocab_shared"):
        assert got[k] == exp[k], k
    assert got["tv"] == exp["tv"]        # float-division only, exact
    assert got["chi2"] == exp["chi2"]    # same
    assert got["js"] == pytest.approx(exp["js"], rel=1e-12)  # ln 1-ulp rule


def test_identical_corpora_zero(spark):
    da = spark.createDataFrame(A, ["doc_id", "text"])
    got = corpus_divergence(da, da, "text").first()
    assert got["tv"] == 0.0 and got["chi2"] == 0.0 and got["js"] == 0.0
    assert got["vocab_shared"] == got["vocab_a"] == got["vocab_b"]


def test_disjoint_corpora_max_tv(spark):
    da = spark.createDataFrame([(0, "aa bb")], ["doc_id", "text"])
    db = spark.createDataFrame([(0, "cc dd")], ["doc_id", "text"])
    got = corpus_divergence(da, db, "text").first()
    assert got["tv"] == 1.0
    assert got["js"] == pytest.approx(1.0, abs=1e-12)
    assert got["vocab_shared"] == 0
