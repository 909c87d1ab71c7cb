"""top_collocations vs a direct python mirror (counts, lift, pmi, order)."""

import math
from collections import Counter

import pytest

from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.collocations import top_collocations

DOCS = [
    "new york is a big city",
    "new york new york",
    "the city of new york",
    "a big apple in the big city",
    "the the the",
    "one",
    "",
    None,
    "big apple big apple big apple",
]


def _mirror(texts, k, min_count):
    uni, bi = Counter(), Counter()
    nw = nb = 0
    for t in texts:
        if t is None:
            continue
        toks = t.split()
        if not toks:
            continue
        uni.update(toks)
        nw += len(toks)
        nb += max(len(toks) - 1, 0)
        bi.update(zip(toks, toks[1:]))
    rows = []
    for (w1, w2), c in bi.items():
        if c < min_count:
            continue
        lift = ((c * float(nw)) * float(nw)) / ((float(nb) * uni[w1]) * uni[w2])
        rows.append((w1, w2, c, lift))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


@pytest.mark.parametrize("min_count,k", [(1, 100), (2, 3), (3, 10)])
def test_matches_mirror(spark, min_count, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], ["doc_id", "text"]
    )
    got = [
        (r["w1"], r["w2"], r["pair_count"], r["lift"], r["pmi"], r["rank"])
        for r in top_collocations(
            df, "doc_id", "text", k=k, min_count=min_count
        ).collect()
    ]
    got.sort(key=lambda r: r[5])
    exp = _mirror(DOCS, k, min_count)
    assert len(got) == len(exp)
    for rank, (g, e) in enumerate(zip(got, exp), 1):
        assert g[:3] == e[:3]
        assert g[3] == e[3]  # lift bit-exact (same op order)
        assert g[4] == pytest.approx(math.log(e[3]), abs=1e-12)
        assert g[5] == rank


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(AssertionError):
        top_collocations(df, "doc_id", "text", k=0)
    with pytest.raises(AssertionError):
        top_collocations(
            df, "doc_id", "text", tokenizer=WhitespaceTokenizer(return_set=True)
        )
