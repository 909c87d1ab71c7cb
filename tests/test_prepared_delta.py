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


@pytest.mark.parametrize("seed,measure,threshold", [
    (0, "jaccard", 0.4),
    (1, "cosine", 0.5),
    (2, "dice", 0.6),
    (3, "jaccard", 0.7),
])
def test_delta_join_randomized_vs_brute_force(spark, seed, measure, threshold):
    """Randomized corpora with Zipf-ish shared vocab + per-row novel tokens:
    the delta-side prefix + position prune must lose no qualifying pair."""
    import random

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(30)]
    def mk(n_rows, id0, novel_tag):
        rows = []
        for i in range(n_rows):
            n = rng.randint(1, 8)
            toks = rng.sample(vocab, min(n, len(vocab)))
            # ~30% of rows get tokens the corpus never sees
            if rng.random() < 0.3:
                toks += [f"{novel_tag}{i}_{j}" for j in range(rng.randint(1, 3))]
            rng.shuffle(toks)
            rows.append((id0 + i, " ".join(toks)))
        return rows

    corpus_rows = mk(60, 0, "c")     # corpus-side novel tokens: rare ranks
    delta_rows = mk(40, 1000, "d")   # delta-side novel tokens: unseen entirely
    corpus_df = spark.createDataFrame(corpus_rows, ["id", "name"])
    delta_df = spark.createDataFrame(delta_rows, ["id", "name"])
    corpus = PreparedSetSimCorpus(corpus_df, "id", "name", WS)

    got = {
        (r["_l_key"], r["_r_key"]): r["_sim_score"]
        for r in corpus.join_delta_pairs(delta_df, measure, threshold).collect()
    }
    want = {}
    for li, ln in delta_rows:
        lt = WS.tokenize(ln)
        for ri, rn in corpus_rows:
            rt = WS.tokenize(rn)
            if not lt or not rt:
                continue
            s = sim_on_sets(measure, lt, rt)
            if s >= threshold:
                want[(li, ri)] = s
    assert set(got) == set(want)
    for pair, s in want.items():
        assert got[pair] == pytest.approx(s, abs=1e-12)
