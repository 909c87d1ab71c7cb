import pytest

from py_stringsimjoin_spark import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.filters import OverlapFilter
from py_stringsimjoin_spark.operators.matcher import apply_matcher
from py_stringsimjoin_spark.operators.profiler import profile_table_for_join

from .oracle import sim_on_sets

KEY_I, NAME_I = 0, 1


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _candset(A, B):
    return OverlapFilter(WhitespaceTokenizer(), 1).filter_tables(
        A, B, "ID", "ID", "name", "name"
    )


def test_apply_matcher_measure_name(spark, person_tables):
    A, B = person_tables
    cand = _candset(A, B)
    out = apply_matcher(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        WhitespaceTokenizer(), "jaccard", 0.5,
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    a_rows = {r[0]: r[1] for r in _rows(A)}
    b_rows = {r[0]: r[1] for r in _rows(B)}
    exp = {}
    for la, rb in {(r["l_ID"], r["r_ID"]) for r in cand.collect()}:
        s = sim_on_sets(
            "jaccard",
            WhitespaceTokenizer().tokenize(a_rows[la]),
            WhitespaceTokenizer().tokenize(b_rows[rb]),
        )
        if s >= 0.5:
            exp[(la, rb)] = s
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_apply_matcher_user_function(spark, person_tables):
    A, B = person_tables
    cand = _candset(A, B)

    def first_token_eq(l_toks, r_toks):
        return 1.0 if (l_toks and r_toks and l_toks[0] == r_toks[0]) else 0.0

    out = apply_matcher(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        WhitespaceTokenizer(), first_token_eq, 1.0, comp_op="=",
    )
    got = {(r["l_ID"], r["r_ID"]) for r in out.collect()}
    assert ("a1", "b2") in got  # Kevin Smith / Kevin Smith
    assert ("a2", "b3") in got  # Oliver A. / Oliver Amos


def test_apply_matcher_edit_distance(spark, person_tables):
    A, B = person_tables
    cand = _candset(A, B)
    out = apply_matcher(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        None, "edit_distance", 2, comp_op="<=",
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    assert got[("a1", "b2")] == 0.0
    assert got[("a4", "b5")] == 1.0  # Basil Nash / Bazil Nash


def test_profiler(spark, person_tables):
    A, _ = person_tables
    prof = {r["attribute"]: r for r in profile_table_for_join(A).collect()}
    assert prof["ID"]["unique_values"] == 7
    assert prof["ID"]["comments"].startswith("This attribute can be used as a key")
    assert prof["name"]["missing_values"] == 1
    assert "ignore 1 rows" in prof["name"]["comments"]


def test_verify_pairs_matches_apply_matcher(spark, person_tables):
    from py_stringsimjoin_spark.operators.matcher import verify_pairs

    A, B = person_tables
    cand = _candset(A, B)
    fast = verify_pairs(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        WhitespaceTokenizer(), "jaccard", 0.5,
    )
    slow = apply_matcher(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        WhitespaceTokenizer(), "jaccard", 0.5,
    )
    f = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in fast.collect()}
    s = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in slow.collect()}
    assert set(f) == set(s)
    for k in f:
        assert f[k] == pytest.approx(s[k], abs=1e-12)
