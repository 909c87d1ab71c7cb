"""contamination_report / contamination_pairs vs a direct python mirror."""

import pytest

from py_stringsimjoin_spark.operators.contamination import (
    contamination_pairs,
    contamination_report,
)

TRAIN = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "THE QUICK BROWN fox ran away"),  # lowercased overlap
    (3, "short"),
    (4, None),
]
BENCH = [
    (100, "quick brown fox jumps over the moon"),
    (101, "five dozen liquor jugs on a shelf"),
    (102, "completely novel words only here"),
    (103, "tiny"),
    (104, None),
]


def _grams(text, n, lowercase=True):
    if text is None:
        return set()
    toks = (text.lower() if lowercase else text).split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.mark.parametrize("n", [3, 4, 1])
def test_report_matches_mirror(spark, n):
    tr = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    be = spark.createDataFrame(BENCH, ["doc_id", "text"])
    got = {
        r["bench_id"]: (r["n_ngrams"], r["n_hit"], r["contamination"], r["contaminated"])
        for r in contamination_report(
            tr, be, "doc_id", "text", "doc_id", "text", n=n
        ).collect()
    }
    train_set = set().union(*[_grams(t, n) for _, t in TRAIN])
    assert set(got) == {i for i, _ in BENCH}
    for i, t in BENCH:
        gs = _grams(t, n)
        hit = len(gs & train_set)
        assert got[i][0] == len(gs)
        assert got[i][1] == hit
        if gs:
            assert got[i][2] == hit / float(len(gs))
        else:
            assert got[i][2] is None
        assert got[i][3] == (hit > 0)


def test_pairs_and_purge(spark):
    tr = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    be = spark.createDataFrame(BENCH, ["doc_id", "text"])
    pairs = {
        (r["bench_id"], r["train_id"]): r["shared_ngrams"]
        for r in contamination_pairs(
            tr, be, "doc_id", "text", "doc_id", "text", n=3
        ).collect()
    }
    for (b, t), c in pairs.items():
        bt = dict(BENCH)[b]
        tt = dict(TRAIN)[t]
        assert c == len(_grams(bt, 3) & _grams(tt, 3)) > 0
    # "quick brown fox" occurs in train docs 0 and 2 -> df=2; purge at 1
    purged = {
        (r["bench_id"], r["train_id"]): r["shared_ngrams"]
        for r in contamination_pairs(
            tr, be, "doc_id", "text", "doc_id", "text", n=3, max_train_df=1
        ).collect()
    }
    assert purged != pairs
    for key, c in purged.items():
        assert c <= pairs[key]


def test_validation(spark):
    tr = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    with pytest.raises(AssertionError):
        contamination_report(tr, tr, "doc_id", "text", "doc_id", "text", n=0)
    with pytest.raises(AssertionError):
        contamination_pairs(
            tr, tr, "doc_id", "text", "doc_id", "text", max_train_df=0
        )
