import numpy as np
import pytest

from py_stringsimjoin_spark import QgramTokenizer, edit_distance_join
from py_stringsimjoin_spark.functions.sims import batch_levenshtein

from .oracle import brute_force_edit_distance, levenshtein

KEY_I, NAME_I = 0, 1


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_batch_levenshtein_matches_scalar():
    import random

    rng = random.Random(7)
    alpha = "abcde"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
        )
        for _ in range(300)
    ]
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same"), ("héllo", "hello")]
    got = batch_levenshtein([p[0] for p in pairs], [p[1] for p in pairs])
    exp = np.array([levenshtein(a, b) for a, b in pairs])
    assert (got == exp).all()


@pytest.mark.parametrize("threshold,comp_op", [(1, "<="), (3, "<="), (2, "<"), (2, "=")])
def test_edit_distance_join_oracle(spark, person_tables, threshold, comp_op):
    A, B = person_tables
    tok = QgramTokenizer(qval=2)
    out = edit_distance_join(
        A, B, "ID", "ID", "name", "name", threshold, comp_op=comp_op, tokenizer=tok
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    exp = brute_force_edit_distance(
        _rows(A), _rows(B), KEY_I, KEY_I, NAME_I, NAME_I, tok, threshold, comp_op
    )
    assert set(got) == set(exp), (set(got) ^ set(exp))
    for k, v in exp.items():
        assert got[k] == v


def test_edit_distance_allow_missing(spark, person_tables):
    A, B = person_tables
    out = edit_distance_join(
        A, B, "ID", "ID", "name", "name", 2, allow_missing=True
    )
    rows = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    assert ("a7", "b1") in rows and rows[("a7", "b1")] is None


def test_edit_distance_requires_qgram(spark, person_tables):
    from py_stringsimjoin_spark import WhitespaceTokenizer

    A, B = person_tables
    with pytest.raises(AssertionError):
        edit_distance_join(
            A, B, "ID", "ID", "name", "name", 2, tokenizer=WhitespaceTokenizer()
        )
