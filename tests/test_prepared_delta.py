"""Incremental delta join vs brute force: joining new rows against a
prepared corpus must equal the cross-side subset of a full join over the
union — including rows whose tokens were never seen by the corpus."""

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark import PreparedSetSimCorpus, WhitespaceTokenizer

from .oracle import sim_on_sets

WS = WhitespaceTokenizer(return_set=True)

CORPUS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta delta"),
    (3, "gamma delta epsilon"),
    (4, "zeta eta theta iota"),
    (5, ""),
    (6, None),
]
DELTA = [
    (101, "alpha beta gamma"),          # exact dup of corpus 1
    (102, "alpha beta NOVEL1 NOVEL2"),  # half unseen tokens — sizes must count them
    (103, "NOVEL3 NOVEL4"),             # fully unseen — matches nothing
    (104, "zeta eta theta"),
    (105, None),
]


@pytest.mark.parametrize("measure,threshold", [
    ("jaccard", 0.5),
    ("jaccard", 0.3),
    ("cosine", 0.6),
    ("dice", 0.5),
])
def test_delta_join_matches_brute_force(spark, measure, threshold):
    corpus_df = spark.createDataFrame(CORPUS, ["id", "name"])
    delta_df = spark.createDataFrame(DELTA, ["id", "name"])
    corpus = PreparedSetSimCorpus(corpus_df, "id", "name", WS)

    got = {
        (r["_l_key"], r["_r_key"]): r["_sim_score"]
        for r in corpus.join_delta_pairs(delta_df, measure, threshold).collect()
    }

    want = {}
    for li, ln in DELTA:
        if ln is None:
            continue
        lt = WS.tokenize(ln)
        for ri, rn in CORPUS:
            if rn is None:
                continue
            rt = WS.tokenize(rn)
            if len(lt) == 0 or len(rt) == 0:
                continue  # allow_empty=False semantics
            s = sim_on_sets(measure, lt, rt)
            if s >= threshold:
                want[(li, ri)] = s

    assert set(got) == set(want)
    for pair, s in want.items():
        assert got[pair] == pytest.approx(s, abs=1e-12)


def test_delta_join_comp_op_gt(spark):
    corpus_df = spark.createDataFrame(CORPUS, ["id", "name"])
    delta_df = spark.createDataFrame(DELTA, ["id", "name"])
    corpus = PreparedSetSimCorpus(corpus_df, "id", "name", WS)
    # exact dup scores 1.0; with comp_op ">" at threshold 1.0 it must vanish
    ge = corpus.join_delta_pairs(delta_df, "jaccard", 1.0).collect()
    gt = corpus.join_delta_pairs(delta_df, "jaccard", 1.0, comp_op=">").collect()
    assert {(r["_l_key"], r["_r_key"]) for r in ge} == {(101, 1)}
    assert gt == []
