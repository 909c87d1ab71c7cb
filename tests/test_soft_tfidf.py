"""Soft TF-IDF: kernel vs an independent per-pair reference + operator."""

import math
import random

import numpy as np
import pytest

from py_stringsimjoin_spark.functions.sims import (
    batch_jaro_winkler,
    batch_soft_tfidf,
)


def ref_soft_tfidf(lt, lw, rt, rw, theta=0.9):
    """Straightforward per-pair implementation (inner sims via the already
    independently-verified jaro-winkler kernel; everything else — close
    set, argmax tie-break, normalization, accumulation — is computed the
    naive way here)."""
    lt, lw = lt or [], lw or []
    rt, rw = rt or [], rw or []
    if not lt and not rt:
        return 1.0
    if not lt or not rt:
        return 0.0
    nl = math.sqrt(sum(w * w for w in lw))
    nr = math.sqrt(sum(w * w for w in rw))
    acc = 0.0
    for x, wx in zip(lt, lw):
        sims = batch_jaro_winkler([x] * len(rt), rt)
        m = sims.max()
        if m > theta:
            cands = [rt[j] for j in range(len(rt)) if sims[j] == m]
            y = max(cands)
            wy = rw[rt.index(y)]
            acc += (wx / nl) * (wy / nr) * float(m)
    return acc


def _rand_side(rng, vocab):
    toks = sorted(rng.sample(vocab, rng.randrange(1, 6)))
    ws = [round(rng.uniform(0.1, 2.0), 3) for _ in toks]
    return toks, ws


@pytest.mark.parametrize("seed", [11, 12])
def test_kernel_vs_reference(seed):
    rng = random.Random(seed)
    vocab = ["jon", "john", "smith", "smyth", "maria", "mariah", "corp",
             "co", "acme", "inc", "data", "dana"]
    L, LW, R, RW = [], [], [], []
    for _ in range(150):
        lt, lw = _rand_side(rng, vocab)
        rt, rw = _rand_side(rng, vocab)
        L.append(lt); LW.append(lw); R.append(rt); RW.append(rw)
    got = batch_soft_tfidf(L, LW, R, RW, 0.8)
    want = [ref_soft_tfidf(a, b, c, d, 0.8) for a, b, c, d in zip(L, LW, R, RW)]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_kernel_semantics():
    # approximate token match earns weight; exact-tfidf would score 0
    s = batch_soft_tfidf([["jon", "smith"]], [[1.0, 1.0]],
                         [["john", "smyth"]], [[1.0, 1.0]], 0.8)[0]
    assert s > 0.8
    # below the inner threshold nothing matches
    z = batch_soft_tfidf([["jon"]], [[1.0]], [["xavier"]], [[1.0]], 0.9)[0]
    assert z == 0.0
    # identical sides with one token -> exactly 1.0 (w/|w| * w/|w| * 1)
    one = batch_soft_tfidf([["acme"]], [[0.37]], [["acme"]], [[0.37]], 0.9)[0]
    assert one == pytest.approx(1.0)
    # empty conventions
    assert batch_soft_tfidf([[]], [[]], [[]], [[]], 0.9)[0] == 1.0
    assert batch_soft_tfidf([["a"]], [[1.0]], [[]], [[]], 0.9)[0] == 0.0
    assert batch_soft_tfidf([None], [None], [["a"]], [[1.0]], 0.9)[0] == 0.0


def test_operator_end_to_end(spark):
    from py_stringsimjoin_spark import WhitespaceTokenizer
    from py_stringsimjoin_spark.operators.weighted import soft_tfidf_score_pairs

    lt = spark.createDataFrame(
        [(1, "jon smith"), (2, "acme corp"), (3, None)], ["id", "name"]
    )
    rt = spark.createDataFrame(
        [(10, "john smyth"), (20, "acme corp inc"), (30, "zzz")], ["id", "name"]
    )
    cand = spark.createDataFrame(
        [(1, 10), (2, 20), (1, 30), (3, 30)], ["l_id", "r_id"]
    )
    out = soft_tfidf_score_pairs(
        cand, "l_id", "r_id", lt, rt, "id", "id", "name", "name",
        WhitespaceTokenizer(), threshold=0.05, inner_threshold=0.8,
        weighting="idf",
    )
    got = {(r.l_id, r.r_id): r._sim_score for r in out.collect()}
    assert (1, 10) in got and got[(1, 10)] > 0.5
    assert (2, 20) in got and got[(2, 20)] > 0.5
    assert (1, 30) not in got  # no approximate token match
    assert (3, 30) not in got  # null left attr -> empty vs non-empty -> 0.0
    # inv_df weighting also runs and keeps relative ordering
    out2 = soft_tfidf_score_pairs(
        cand, "l_id", "r_id", lt, rt, "id", "id", "name", "name",
        WhitespaceTokenizer(), threshold=0.05, inner_threshold=0.8,
        weighting="inv_df",
    )
    got2 = {(r.l_id, r.r_id): r._sim_score for r in out2.collect()}
    assert set(got2) == {(1, 10), (2, 20)}
