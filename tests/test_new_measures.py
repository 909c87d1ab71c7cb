"""Round-4 matcher measures: tversky_index, bag_distance, generalized_jaccard.

Parity strategy mirrors the other measure suites: hand-computed vectors,
independent-reference randomized parity (DuckDB inner sims + an
independently-written scalar matcher in this file), and the end-to-end
apply_matcher surface over the reference-shaped person fixtures.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from py_stringsimjoin_spark.functions.sims import (
    batch_bag_distance,
    batch_generalized_jaccard,
    batch_levenshtein,
    batch_set_sim,
    batch_tversky,
)


def _enc2(l_lists, r_lists):
    """Encode BOTH sides against one shared vocab (ids must align)."""
    vocab: dict = {}

    def enc(lists):
        out = []
        for ts in lists:
            if ts is None:
                out.append(None)
                continue
            ids = {vocab.setdefault(t, len(vocab)) for t in ts}
            out.append(np.fromiter(sorted(ids), np.int64, len(ids)))
        return out

    return enc(l_lists), enc(r_lists)


# ------------------------------------------------------------------ tversky


def test_tversky_hand_cases():
    l, r = _enc2(
        [["a", "b", "c"], ["a"], [], []],
        [["b", "c", "d"], ["b"], [], ["a"]],
    )
    # row 0: overlap=2, |A\B|=1, |B\A|=1
    got = batch_tversky(l, r)
    assert got[0] == pytest.approx(2.0 / (2.0 + 0.5 + 0.5))
    assert got[1] == 0.0
    assert got[2] == 1.0  # both empty
    assert got[3] == 0.0  # one empty


def test_tversky_degenerate_forms():
    """alpha=beta=0.5 is Dice; alpha=beta=1 is Jaccard — exact equality."""
    rng = random.Random(7)
    ls, rs = [], []
    for _ in range(200):
        ls.append([str(rng.randrange(20)) for _ in range(rng.randrange(8))])
        rs.append([str(rng.randrange(20)) for _ in range(rng.randrange(8))])
    le, re_ = _enc2(ls, rs)
    np.testing.assert_array_equal(
        batch_tversky(le, re_, 0.5, 0.5), batch_set_sim("dice", le, re_)
    )
    np.testing.assert_array_equal(
        batch_tversky(le, re_, 1.0, 1.0), batch_set_sim("jaccard", le, re_)
    )


def test_tversky_asymmetry():
    # A={a,b,c,d}, B={a}: ov=1, |A\B|=3, |B\A|=0
    l, r = _enc2([["a", "b", "c", "d"]], [["a"]])
    s_ab = batch_tversky(l, r, 0.9, 0.1)[0]
    s_ba = batch_tversky(r, l, 0.9, 0.1)[0]
    assert s_ab == pytest.approx(1.0 / (1.0 + 0.9 * 3))
    assert s_ba == pytest.approx(1.0 / (1.0 + 0.1 * 3))
    assert s_ab != s_ba


# -------------------------------------------------------------- bag distance


def test_bag_distance_hand_cases():
    got = batch_bag_distance(
        ["abc", "aab", "", "hello", "cat", "résumé"],
        ["cba", "abb", "x", "help", "dog", "resume"],
    )
    np.testing.assert_array_equal(got, [0.0, 1.0, 1.0, 2.0, 3.0, 2.0])


def test_bag_distance_lower_bounds_levenshtein():
    """Bag distance is the classic cheap lower bound on edit distance
    (Bartolini et al.) — must hold on random strings."""
    rng = random.Random(11)
    alpha = "abcdefg"
    ls = ["".join(rng.choice(alpha) for _ in range(rng.randrange(12))) for _ in range(300)]
    rs = ["".join(rng.choice(alpha) for _ in range(rng.randrange(12))) for _ in range(300)]
    bag = batch_bag_distance(ls, rs)
    lev = batch_levenshtein(ls, rs)
    assert (bag <= lev + 1e-12).all()


def test_bag_distance_duckdb_parity():
    """Bit parity vs the replace-trick SQL form the driver oracle uses."""
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(13)
    alpha = "abcde "
    ls = ["".join(rng.choice(alpha) for _ in range(rng.randrange(10))) for _ in range(120)]
    rs = ["".join(rng.choice(alpha) for _ in range(rng.randrange(10))) for _ in range(120)]
    got = batch_bag_distance(ls, rs)
    con = duckdb.connect()
    for a, b, g in zip(ls, rs, got):
        want = con.execute(
            """
            SELECT greatest(
              len(?1) - common, len(?2) - common
            ) FROM (SELECT coalesce(list_sum(list_transform(
                list_distinct(string_split(?1 || ?2, '')),
                c -> least(len(?1) - len(replace(?1, c, '')),
                           len(?2) - len(replace(?2, c, ''))))), 0) AS common)
            """,
            [a, b],
        ).fetchone()[0]
        assert g == float(want), (a, b)


# ------------------------------------------------------ generalized jaccard


def _gj_reference(con, l_toks, r_toks, threshold=0.5):
    """Independent scalar GeneralizedJaccard: DuckDB jaro per token pair +
    straightforward greedy matching, written without reference to the
    vectorized kernel."""
    if not l_toks and not r_toks:
        return 1.0
    if not l_toks or not r_toks:
        return 0.0
    scored = []
    for i, a in enumerate(l_toks):
        for j, b in enumerate(r_toks):
            s = con.execute("select jaro_similarity(?,?)", [a, b]).fetchone()[0]
            if s >= threshold:
                scored.append((s, i, j))
    scored.sort(key=lambda t: t[0], reverse=True)
    used_i, used_j = set(), set()
    acc, matched = 0.0, 0
    for s, i, j in scored:
        if i not in used_i and j not in used_j:
            used_i.add(i)
            used_j.add(j)
            acc += s
            matched += 1
    return acc / (len(l_toks) + len(r_toks) - matched)


def test_generalized_jaccard_hand_and_edges():
    got = batch_generalized_jaccard([[], [], ["x"]], [[], ["y"], []])
    np.testing.assert_array_equal(got, [1.0, 0.0, 0.0])
    # identical sets -> 1.0 (every token matches itself at sim 1.0)
    got = batch_generalized_jaccard([["foo", "bar"]], [["bar", "foo"]])
    assert got[0] == pytest.approx(1.0)


def test_generalized_jaccard_reference_parity():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    rng = random.Random(17)
    words = ["night", "nite", "hawk", "owl", "smith", "smyth", "kevin",
             "keven", "porter", "portr", "ave", "st", "san", "jose"]
    ls, rs = [], []
    for _ in range(80):
        ls.append(rng.sample(words, rng.randrange(1, 5)))
        rs.append(rng.sample(words, rng.randrange(1, 5)))
    got = batch_generalized_jaccard(ls, rs)
    for i in range(len(ls)):
        want = _gj_reference(con, ls[i], rs[i])
        assert got[i] == pytest.approx(want, abs=1e-12), (ls[i], rs[i])


# ------------------------------------------------------- apply_matcher e2e


def test_apply_matcher_new_measures(spark, person_tables):
    from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
    from py_stringsimjoin_spark.operators.filters import OverlapFilter
    from py_stringsimjoin_spark.operators.matcher import apply_matcher

    a, b = person_tables
    ws = WhitespaceTokenizer(return_set=True)
    cand = OverlapFilter(ws, 1).filter_tables(
        a, b, "ID", "ID", "name", "name"
    )
    tv = apply_matcher(
        cand, "l_ID", "r_ID", a, b, "ID", "ID", "name", "name",
        ws, "tversky_index", 0.5, measure_args={"alpha": 0.75, "beta": 0.25},
    ).select("l_ID", "r_ID", "_sim_score").collect()
    assert {(r[0], r[1]) for r in tv} >= {("a1", "b2"), ("a4", "b5")}
    for r in tv:
        assert 0.5 <= r[2] <= 1.0

    bd = apply_matcher(
        cand, "l_ID", "r_ID", a, b, "ID", "ID", "name", "name",
        None, "bag_distance", 2.0, comp_op="<=",
    ).select("l_ID", "r_ID", "_sim_score").collect()
    got = {(r[0], r[1]): r[2] for r in bd}
    assert got[("a1", "b2")] == 0.0  # identical names
    assert got[("a4", "b5")] == 1.0  # Basil/Bazil: one substitution

    gj = apply_matcher(
        cand, "l_ID", "r_ID", a, b, "ID", "ID", "name", "name",
        ws, "generalized_jaccard", 0.8,
    ).select("l_ID", "r_ID", "_sim_score").collect()
    gjm = {(r[0], r[1]): r[2] for r in gj}
    assert gjm[("a1", "b2")] == pytest.approx(1.0)
    assert ("a4", "b5") in gjm  # Basil Nash / Bazil Nash: high but < 1
    assert 0.8 <= gjm[("a4", "b5")] < 1.0


def test_verify_pairs_tversky_jvm_path(spark, person_tables):
    """verify_pairs' pure-JVM tversky expression must agree exactly with the
    Arrow-side batch_tversky kernel over the same candset."""
    from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
    from py_stringsimjoin_spark.operators.filters import OverlapFilter
    from py_stringsimjoin_spark.operators.matcher import apply_matcher, verify_pairs

    a, b = person_tables
    ws = WhitespaceTokenizer(return_set=True)
    cand = OverlapFilter(ws, 1).filter_tables(a, b, "ID", "ID", "name", "name")
    args = {"alpha": 0.75, "beta": 0.25}
    jvm = verify_pairs(
        cand, "l_ID", "r_ID", a, b, "ID", "ID", "name", "name",
        ws, "tversky_index", 0.4, measure_args=args,
    ).select("l_ID", "r_ID", "_sim_score").collect()
    arrow = apply_matcher(
        cand, "l_ID", "r_ID", a, b, "ID", "ID", "name", "name",
        ws, "tversky_index", 0.4, measure_args=args,
    ).select("l_ID", "r_ID", "_sim_score").collect()
    jd = {(r[0], r[1]): r[2] for r in jvm}
    ad = {(r[0], r[1]): r[2] for r in arrow}
    assert jd.keys() == ad.keys() and len(jd) > 0
    for k in jd:
        assert jd[k] == ad[k], k
