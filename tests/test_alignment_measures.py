"""Alignment measures (NW / SW / affine gap): batch kernels vs an
independent per-pair DP reference, plus apply_matcher integration."""

import random

import numpy as np
import pytest

from py_stringsimjoin_spark.functions.sims import (
    batch_affine_gap,
    batch_needleman_wunsch,
    batch_smith_waterman,
)

NEG = -1.0e30


def ref_nw(a, b, g=1.0, match=1.0, mismatch=0.0):
    la, lb = len(a), len(b)
    d = [[0.0] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        d[i][0] = -g * i
    for j in range(1, lb + 1):
        d[0][j] = -g * j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            d[i][j] = max(d[i - 1][j - 1] + s, d[i - 1][j] - g, d[i][j - 1] - g)
    return d[la][lb]


def ref_sw(a, b, g=1.0, match=1.0, mismatch=0.0):
    la, lb = len(a), len(b)
    d = [[0.0] * (lb + 1) for _ in range(la + 1)]
    best = 0.0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            d[i][j] = max(
                0.0, d[i - 1][j - 1] + s, d[i - 1][j] - g, d[i][j - 1] - g
            )
            best = max(best, d[i][j])
    return best


def ref_affine(a, b, gs=1.0, gc=0.5, match=1.0, mismatch=0.0):
    la, lb = len(a), len(b)
    M = [[NEG] * (lb + 1) for _ in range(la + 1)]
    X = [[NEG] * (lb + 1) for _ in range(la + 1)]
    Y = [[NEG] * (lb + 1) for _ in range(la + 1)]
    M[0][0] = 0.0
    for i in range(1, la + 1):
        X[i][0] = -gs - (i - 1) * gc
    for j in range(1, lb + 1):
        Y[0][j] = -gs - (j - 1) * gc
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            M[i][j] = s + max(M[i - 1][j - 1], X[i - 1][j - 1], Y[i - 1][j - 1])
            X[i][j] = max(M[i - 1][j] - gs, X[i - 1][j] - gc)
            Y[i][j] = max(M[i][j - 1] - gs, Y[i][j - 1] - gc)
    return max(M[la][lb], X[la][lb], Y[la][lb])


def _rand_strings(rng, n, alphabet="abcd", maxlen=12):
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(maxlen)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_batch_vs_reference_randomized(seed):
    rng = random.Random(seed)
    ls = _rand_strings(rng, 200)
    rs = _rand_strings(rng, 200)
    np.testing.assert_allclose(
        batch_needleman_wunsch(ls, rs),
        [ref_nw(a, b) for a, b in zip(ls, rs)], atol=1e-9,
    )
    np.testing.assert_allclose(
        batch_smith_waterman(ls, rs),
        [ref_sw(a, b) for a, b in zip(ls, rs)], atol=1e-9,
    )
    np.testing.assert_allclose(
        batch_affine_gap(ls, rs),
        [ref_affine(a, b) for a, b in zip(ls, rs)], atol=1e-9,
    )


def test_known_values():
    assert batch_needleman_wunsch([""], [""])[0] == 0.0
    assert batch_needleman_wunsch(["a"], [""])[0] == -1.0
    assert batch_needleman_wunsch(["abc"], ["abc"])[0] == 3.0
    # one substitution in the middle: 2 matches + 1 mismatch(0)
    assert batch_needleman_wunsch(["abc"], ["axc"])[0] == 2.0
    # local alignment ignores the differing prefix
    assert batch_smith_waterman(["cat"], ["hat"])[0] == 2.0
    assert batch_smith_waterman([""], ["xyz"])[0] == 0.0
    # affine: one long gap beats two short ones
    # "ab" vs "axxxb": gap of 3 -> match(a)+match(b) - (1 + 0.5 + 0.5)
    assert batch_affine_gap(["ab"], ["axxxb"])[0] == pytest.approx(0.0)
    assert batch_affine_gap([""], [""])[0] == 0.0
    assert batch_affine_gap(["abcd"], [""])[0] == pytest.approx(-1.0 - 1.5)
    # None behaves as ''
    assert batch_needleman_wunsch([None, "ab"], ["ab", None]).tolist() == [-2.0, -2.0]


def test_nonuniform_costs_and_unicode():
    rng = random.Random(7)
    ls = _rand_strings(rng, 60, alphabet="aéb漢")
    rs = _rand_strings(rng, 60, alphabet="aéb漢")
    np.testing.assert_allclose(
        batch_needleman_wunsch(ls, rs, gap_cost=0.7, match=2.0, mismatch=-0.3),
        [ref_nw(a, b, g=0.7, match=2.0, mismatch=-0.3) for a, b in zip(ls, rs)],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        batch_smith_waterman(ls, rs, gap_cost=0.4, match=1.5, mismatch=-1.0),
        [ref_sw(a, b, g=0.4, match=1.5, mismatch=-1.0) for a, b in zip(ls, rs)],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        batch_affine_gap(ls, rs, gap_start=1.2, gap_continuation=0.3),
        [ref_affine(a, b, gs=1.2, gc=0.3) for a, b in zip(ls, rs)],
        atol=1e-9,
    )


def test_apply_matcher_alignment_measures(spark):
    from py_stringsimjoin_spark import apply_matcher

    lt = spark.createDataFrame(
        [(1, "data engine"), (2, "sparkly")], ["id", "txt"]
    )
    rt = spark.createDataFrame(
        [(10, "data engind"), (20, "spark")], ["id", "txt"]
    )
    cand = spark.createDataFrame([(1, 10), (2, 20)], ["l_id", "r_id"])
    out = apply_matcher(
        cand, "l_id", "r_id", lt, rt, "id", "id", "txt", "txt",
        tokenizer=None, sim_function="needleman_wunsch", threshold=-1e9,
        comp_op=">=",
    ).collect()
    got = {(r.l_id, r.r_id): r._sim_score for r in out}
    assert got[(1, 10)] == ref_nw("data engine", "data engind")
    assert got[(2, 20)] == ref_nw("sparkly", "spark")
    out2 = apply_matcher(
        cand, "l_id", "r_id", lt, rt, "id", "id", "txt", "txt",
        tokenizer=None, sim_function="affine_gap", threshold=-1e9,
        comp_op=">=",
    ).collect()
    got2 = {(r.l_id, r.r_id): r._sim_score for r in out2}
    assert got2[(2, 20)] == pytest.approx(ref_affine("sparkly", "spark"))
