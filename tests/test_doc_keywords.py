"""doc_keywords vs a direct python mirror (rational tf-idf, exact order)."""

from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.textstats import doc_keywords

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana date"),
    (2, "apple cherry cherry cherry"),
    (3, "unique singleton words here"),
    (4, None),
    (5, ""),
]


def _mirror(docs, k, min_df, max_df_frac):
    tf = {}
    for i, t in docs:
        if t is None:
            continue
        for w, c in Counter(t.lower().split()).items():
            tf[(i, w)] = c
    dfreq = Counter(w for _, w in tf)
    n = len(docs)
    out = {}
    for (i, w), c in tf.items():
        if dfreq[w] < min_df:
            continue
        if max_df_frac is not None and dfreq[w] > max_df_frac * float(n):
            continue
        score = (c * float(n)) / float(dfreq[w])
        out.setdefault(i, []).append((w, c, dfreq[w], score))
    exp = {}
    for i, rows in out.items():
        rows.sort(key=lambda r: (-r[3], r[0]))
        for rank, r in enumerate(rows[:k], 1):
            exp[(i, r[0])] = (r[1], r[2], r[3], rank)
    return exp


@pytest.mark.parametrize("k,min_df,max_df_frac", [(3, 1, None), (10, 2, None), (2, 1, 0.4)])
def test_matches_mirror(spark, k, min_df, max_df_frac):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["token"]): (r["tf"], r["doc_freq"], r["score"], r["rank"])
        for r in doc_keywords(
            df, "doc_id", "text", k=k, min_df=min_df, max_df_frac=max_df_frac
        ).collect()
    }
    assert got == _mirror(DOCS, k, min_df, max_df_frac)


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(AssertionError):
        doc_keywords(df, "doc_id", "text", k=0)
    with pytest.raises(AssertionError):
        doc_keywords(df, "doc_id", "text", max_df_frac=1.5)
