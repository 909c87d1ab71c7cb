"""Containment join (|∩|/|l| comp_op t) vs brute force — asymmetric measure,
so (A,B) and (B,A) both tested, plus self-join ordered-pair semantics."""

import random

import pytest

from py_stringsimjoin_spark import (
    QgramTokenizer,
    WhitespaceTokenizer,
    containment_join,
    containment_join_pairs,
)

from .oracle import brute_force_set_sim

KEY_I, NAME_I = 0, 1


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("threshold,comp_op", [(0.5, ">="), (0.8, ">="), (1.0, ">="), (0.5, ">")])
def test_containment_join_oracle(spark, person_tables, threshold, comp_op):
    A, B = person_tables
    out = containment_join(
        A, B, "ID", "ID", "name", "name", WhitespaceTokenizer(), threshold, comp_op
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    exp = brute_force_set_sim(
        _rows(A), _rows(B), KEY_I, KEY_I, NAME_I, NAME_I,
        WhitespaceTokenizer(), "containment", threshold, comp_op, allow_empty=False,
    )
    assert set(got) == set(exp), (set(got) ^ set(exp))
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_containment_asymmetry(spark, person_tables):
    """containment(A→B) ≠ containment(B→A): swapping sides changes the
    denominator, so the pair sets differ where sizes differ."""
    A, B = person_tables
    ab = containment_join(
        A, B, "ID", "ID", "name", "name", WhitespaceTokenizer(), 0.99
    )
    ba = containment_join(
        B, A, "ID", "ID", "name", "name", WhitespaceTokenizer(), 0.99
    )
    got_ab = {(r["l_ID"], r["r_ID"]) for r in ab.collect()}
    got_ba = {(r["r_ID"], r["l_ID"]) for r in ba.collect()}
    # "James Jordan Jr." (a3, 3 tokens) vs "James Jordan" (b4, 2 tokens):
    # b4 ⊂ a3 fully, a3 ⊄ b4
    assert ("a3", "b4") not in got_ab
    assert ("a3", "b4") in got_ba


def test_containment_self_join_excludes_self(spark, person_tables):
    A, _ = person_tables
    pairs = containment_join_pairs(
        A, A, "ID", "ID", "name", "name", WhitespaceTokenizer(), 0.5,
        exclude_self_pairs=True,
    )
    got = {(r["_l_key"], r["_r_key"]) for r in pairs.collect()}
    assert all(l != r for l, r in got)


def test_containment_allow_empty_and_missing(spark, person_tables):
    A, B = person_tables
    out = containment_join(
        A, B, "ID", "ID", "name", "name", WhitespaceTokenizer(), 0.7,
        allow_empty=True, allow_missing=True,
    )
    rows = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    # (∅,∅): a6/b7 are whitespace-only names
    assert rows.get(("a6", "b7")) == 1.0
    # missing: a7 has NULL name → NULL-score pairs against every b row
    assert ("a7", "b1") in rows and rows[("a7", "b1")] is None
    # ∅-in-nonempty pairs are NOT emitted (documented OC-style semantics)
    assert ("a6", "b1") not in rows


def _random_tables(spark, seed, n=60):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randint(1, 8))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "txt"]), rows


@pytest.mark.parametrize("seed", [1, 7])
@pytest.mark.parametrize("threshold", [0.4, 0.75, 1.0])
def test_containment_randomized(spark, seed, threshold):
    df, rows = _random_tables(spark, seed)
    pairs = containment_join_pairs(
        df, df, "id", "id", "txt", "txt", WhitespaceTokenizer(return_set=True),
        threshold, exclude_self_pairs=True,
    )
    got = {(r["_l_key"], r["_r_key"]): r["_sim_score"] for r in pairs.collect()}
    exp = {
        k: v
        for k, v in brute_force_set_sim(
            rows, rows, 0, 0, 1, 1, WhitespaceTokenizer(), "containment",
            threshold, ">=", allow_empty=False,
        ).items()
        if k[0] != k[1]
    }
    assert set(got) == set(exp), (set(got) ^ set(exp))
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_containment_qgram_quotation(spark):
    """The motivating use: detect a snippet quoted inside a larger page via
    3-gram containment even when the page is much larger (Jaccard misses)."""
    snippet = "the quick brown fox jumps over the lazy dog"
    page = "start padding text here " + snippet + " and a very long tail " \
        + " ".join(f"filler{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, snippet), (2, page), (3, "completely unrelated content body")],
        ["id", "txt"],
    )
    tok = QgramTokenizer(qval=3, return_set=True)
    pairs = containment_join_pairs(
        df, df, "id", "id", "txt", "txt", tok, 0.9, exclude_self_pairs=True
    )
    got = {(r["_l_key"], r["_r_key"]): r["_sim_score"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert (2, 1) not in got  # the page is not contained in the snippet
    assert all(3 not in k for k in got)
