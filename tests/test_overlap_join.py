import pytest

from py_stringsimjoin_spark import (
    WhitespaceTokenizer,
    overlap_coefficient_join,
    overlap_join,
)

from .oracle import brute_force_set_sim

KEY_I, NAME_I = 0, 1


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("threshold,comp_op", [(1, ">="), (2, ">="), (1, ">"), (2, "=")])
def test_overlap_join_oracle(spark, person_tables, threshold, comp_op):
    A, B = person_tables
    out = overlap_join(
        A, B, "ID", "ID", "name", "name", WhitespaceTokenizer(), threshold, comp_op
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    exp = brute_force_set_sim(
        _rows(A), _rows(B), KEY_I, KEY_I, NAME_I, NAME_I,
        WhitespaceTokenizer(), "overlap", threshold, comp_op, allow_empty=False,
    )
    # overlap joins can't see 0-overlap pairs; oracle thresholds are >0 so sets agree
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == v


@pytest.mark.parametrize("threshold", [0.5, 0.8, 1.0])
def test_overlap_coefficient_join_oracle(spark, person_tables, threshold):
    A, B = person_tables
    out = overlap_coefficient_join(
        A, B, "ID", "ID", "name", "name", WhitespaceTokenizer(), threshold
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    exp = brute_force_set_sim(
        _rows(A), _rows(B), KEY_I, KEY_I, NAME_I, NAME_I,
        WhitespaceTokenizer(), "overlap_coefficient", threshold,
    )
    assert set(got) == set(exp), (set(got) ^ set(exp))
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_overlap_join_allow_missing(spark, person_tables):
    A, B = person_tables
    out = overlap_join(
        A, B, "ID", "ID", "name", "name", WhitespaceTokenizer(), 1,
        allow_missing=True,
    )
    rows = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    assert ("a7", "b1") in rows and rows[("a7", "b1")] is None
