"""Winnowing vs a direct python mirror + the SIGMOD'03 guarantee property."""

import hashlib

import numpy as np
import pytest

from py_stringsimjoin_spark.operators.winnowing import (
    fingerprint_matches,
    winnow_fingerprints,
)


def _mirror(text, k, w):
    n = len(text)
    if n < k:
        return set()
    hashes = [
        hashlib.md5(text[p : p + k].encode()).hexdigest()[:16]
        for p in range(n - k + 1)
    ]
    ng = len(hashes)
    nw = max(1, ng - w + 1)
    out = set()
    for i in range(nw):
        win = hashes[i : min(i + w, ng)]
        mh = min(win)
        # rightmost position achieving the min
        pos = max(j for j in range(i, min(i + w, ng)) if hashes[j] == mh)
        out.add((pos + 1, mh))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.RandomState(13)
    words = ["alpha", "beta", "gamma", "delta", "ep", "zz", "x"]
    texts = []
    for i in range(25):
        texts.append(" ".join(rng.choice(words, rng.randint(1, 30))))
    texts += ["", "ab", "abcdefgh", "aaaaaaaaaaaaaaaa"]  # edge lengths + ties
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, ["doc_id", "text"]), dict(rows)


@pytest.mark.parametrize("k,w", [(8, 4), (5, 1), (3, 7)])
def test_matches_mirror(spark, docs, k, w):
    df, texts = docs
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect():
        got.setdefault(r["id"], set()).add((r["pos"], r["fp"]))
    for i, t in texts.items():
        exp = _mirror(t, k, w)
        assert got.get(i, set()) == exp, f"doc {i} k={k} w={w}"


def test_guarantee_threshold(spark):
    """Two docs sharing a substring of length >= k + w - 1 must share a
    fingerprint (the winnowing guarantee)."""
    k, w = 6, 5
    shared = "thequickbrownfoxjumps"  # len 21 >= 6+5-1
    rows = [
        (0, "xxxx" + shared + "yyyyyyy"),
        (1, "zzzzzzzzzz" + shared + "qq"),
        (2, "completely different text here entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    m = {
        (r["l_id"], r["r_id"])
        for r in fingerprint_matches(df, "doc_id", "text", k=k, w=w).collect()
    }
    assert (0, 1) in m


def test_density(spark):
    """Selected fraction is near the 2/(w+1) expectation, and every doc
    with >= k chars has at least one fingerprint."""
    rng = np.random.RandomState(2)
    alphabet = list("abcdefghijklmnop")
    text = "".join(rng.choice(alphabet, 4000))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    k, w = 8, 7
    fps = winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    frac = len(fps) / (len(text) - k + 1)
    assert 0.15 <= frac <= 0.4  # 2/(w+1) = 0.25
    short = spark.createDataFrame([(0, "exactlyk")], ["doc_id", "text"])
    assert winnow_fingerprints(short, "doc_id", "text", k=8, w=4).count() == 1


def test_validation(spark, docs):
    df, _ = docs
    with pytest.raises(AssertionError):
        winnow_fingerprints(df, "doc_id", "text", k=0)
    with pytest.raises(AssertionError):
        fingerprint_matches(df, "doc_id", "text", min_shared=0)
