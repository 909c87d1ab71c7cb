"""mutual_best_match / score_histogram vs Python mirrors."""

import math
import random

import pytest

from py_stringsimjoin_spark.operators.matching_utils import (
    mutual_best_match,
    score_histogram,
)


def brute_mutual(scored, min_score=None):
    best_l, best_r = {}, {}
    for l, r, s in scored:
        if s is None or (min_score is not None and s < min_score):
            continue
        if l not in best_l or (-s, r) < best_l[l][0]:
            best_l[l] = ((-s, r), (l, r, s))
        if r not in best_r or (-s, l) < best_r[r][0]:
            best_r[r] = ((-s, l), (l, r, s))
    lw = {v[1] for v in best_l.values()}
    rw = {v[1] for v in best_r.values()}
    return lw & rw


@pytest.mark.parametrize("min_score", [None, 0.4])
def test_mutual_best_match(spark, min_score):
    rng = random.Random(31)
    scored = list({
        (rng.randint(0, 15), rng.randint(100, 115),
         rng.choice([None, round(rng.random(), 6)]))
        for _ in range(120)
    })
    df = spark.createDataFrame(scored, "l long, r long, score double")
    got = {(r.l, r.r, r.score)
           for r in mutual_best_match(df, "l", "r", "score", min_score).collect()}
    assert got == brute_mutual(scored, min_score)
    # one-to-one: no key repeats on either side
    assert len({l for l, _, _ in got}) == len(got)
    assert len({r for _, r, _ in got}) == len(got)


def brute_hist(scores, n_bins):
    vals = [s for s in scores if s is not None]
    lo, hi = min(vals), max(vals)
    out = {}
    for s in vals:
        b = 0 if hi == lo else min(n_bins - 1, math.floor((s - lo) / ((hi - lo) / n_bins)))
        out[b] = out.get(b, 0) + 1
    bw = (hi - lo) / n_bins
    return {b: (lo + b * bw, lo + (b + 1) * bw, n) for b, n in out.items()}


@pytest.mark.parametrize("n_bins", [1, 7, 50])
def test_score_histogram(spark, n_bins):
    rng = random.Random(13)
    scores = [rng.choice([None, rng.uniform(-2, 5)]) for _ in range(300)]
    df = spark.createDataFrame([(s,) for s in scores], "score double")
    got = {r.bin: (r.bin_lo, r.bin_hi, r.n_pairs)
           for r in score_histogram(df, "score", n_bins).collect()}
    want = brute_hist(scores, n_bins)
    assert set(got) == set(want)
    for b in want:
        assert got[b][2] == want[b][2]
        assert got[b][0] == want[b][0] and got[b][1] == want[b][1]
    assert sum(n for _, _, n in got.values()) == sum(
        1 for s in scores if s is not None
    )


def test_histogram_constant_and_validation(spark):
    df = spark.createDataFrame([(1.5,), (1.5,), (None,)], "score double")
    rows = score_histogram(df, "score", 10).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n_pairs == 2
    with pytest.raises(AssertionError):
        score_histogram(df, "score", 0)
    with pytest.raises(AssertionError):
        mutual_best_match(df, "score", "score", "nope")
