"""dictionary_tag: expr vs python mirror, aho vs overlapping-count mirror."""

import pytest

from py_stringsimjoin_spark.operators.dictionary_tag import dictionary_tag

DOCS = [
    (0, "the big apple is a big city"),
    (1, "BIG Apple pie"),
    (2, "nothing to see"),
    (3, None),
    (4, "aaa"),
    (5, "apple appleapple"),
]
PHRASES = ["big apple", "big", "aa", "apple"]


def _greedy_count(text, p):
    # non-overlapping left-to-right (the replace-length identity)
    n = 0
    i = 0
    while True:
        j = text.find(p, i)
        if j < 0:
            return n
        n += 1
        i = j + len(p)


def _overlap_count(text, p):
    n = 0
    for i in range(len(text) - len(p) + 1):
        if text[i : i + len(p)] == p:
            n += 1
    return n


@pytest.mark.parametrize("method,counter", [("expr", _greedy_count), ("aho", _overlap_count)])
def test_matches_mirror(spark, method, counter):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["id"], r["phrase"]): r["n_hits"]
        for r in dictionary_tag(
            df, "doc_id", "text", PHRASES, lowercase=True, method=method
        ).collect()
    }
    exp = {}
    for i, t in DOCS:
        if t is None:
            continue
        tl = t.lower()
        for p in PHRASES:
            c = counter(tl, p.lower())
            if c > 0:
                exp[(i, p.lower())] = c
    assert got == exp


def test_overlap_semantics_difference(spark):
    df = spark.createDataFrame([(0, "aaa")], ["doc_id", "text"])
    e = dictionary_tag(df, "doc_id", "text", ["aa"], method="expr").first()
    a = dictionary_tag(df, "doc_id", "text", ["aa"], method="aho").first()
    assert e["n_hits"] == 1 and a["n_hits"] == 2


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(AssertionError):
        dictionary_tag(df, "doc_id", "text", [])
    with pytest.raises(AssertionError):
        dictionary_tag(df, "doc_id", "text", ["a", "a"])
    with pytest.raises(AssertionError):
        dictionary_tag(df, "doc_id", "text", ["A", "a"], lowercase=True)
    with pytest.raises(AssertionError):
        dictionary_tag(df, "doc_id", "text", ["x"], method="nope")
