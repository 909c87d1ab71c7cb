import pytest

from py_stringsimjoin_spark import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.filters import (
    OverlapFilter,
    PositionFilter,
    PrefixFilter,
    SizeFilter,
    SuffixFilter,
)

from .oracle import apply_comp, brute_force_set_sim, sim_on_sets

KEY_I, NAME_I = 0, 1


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _pairs(df, lc="l_ID", rc="r_ID"):
    return {(r[lc], r[rc]) for r in df.collect()}


# --- filter_pair truth tables (reference-style, tests/test_overlap_filter.py:20-56)

def test_overlap_filter_pair():
    f = OverlapFilter(WhitespaceTokenizer(), 1)
    assert f.filter_pair("data science", "data analysis") is False
    assert f.filter_pair("data science", "web mining") is True
    f3 = OverlapFilter(WhitespaceTokenizer(), 3)
    assert f3.filter_pair("a b c d", "a b c x") is False
    assert f3.filter_pair("a b c d", "a b x y") is True
    feq = OverlapFilter(WhitespaceTokenizer(), 2, comp_op="=")
    assert feq.filter_pair("a b c", "a b x") is False
    assert feq.filter_pair("a b c", "a b c") is True  # overlap 3 != 2 -> dropped
    assert OverlapFilter(WhitespaceTokenizer(), 1).filter_pair(None, "x") is True
    assert OverlapFilter(WhitespaceTokenizer(), 1, allow_missing=True).filter_pair(None, "x") is False


def test_size_filter_pair():
    f = SizeFilter(WhitespaceTokenizer(), "JACCARD", 0.5)
    # |l|=4 -> bounds [2, 8]
    assert f.filter_pair("a b c d", "x y") is False
    assert f.filter_pair("a b c d", "x") is True
    assert f.filter_pair(" ", " ") is False  # empty-empty, allow_empty default
    assert SizeFilter(WhitespaceTokenizer(), "JACCARD", 0.5, allow_empty=False).filter_pair(" ", " ") is True


def test_prefix_and_position_filter_pair_superset():
    """filter_pair must never drop a truly-matching pair (superset guarantee)."""
    tok = WhitespaceTokenizer()
    vals = ["data science", "data analysis", "science of data", "a b c d", "a b c x",
            "x y", "a", " ", "q w e r t y"]
    for t in (0.3, 0.5, 0.8):
        pf = PrefixFilter(tok, "JACCARD", t)
        pos = PositionFilter(tok, "JACCARD", t)
        sf = SuffixFilter(tok, "JACCARD", t)
        for lv in vals:
            for rv in vals:
                sim = sim_on_sets("jaccard", tok.tokenize(lv), tok.tokenize(rv))
                if sim >= t:
                    assert pf.filter_pair(lv, rv) is False, (lv, rv, t)
                    assert pos.filter_pair(lv, rv) is False, (lv, rv, t)
                    assert sf.filter_pair(lv, rv) is False, (lv, rv, t)


# --- filter_tables candidate-superset vs brute force --------------------------

@pytest.mark.parametrize("cls", [PrefixFilter, PositionFilter])
def test_filter_tables_superset(spark, person_tables, cls):
    A, B = person_tables
    t = 0.5
    f = cls(WhitespaceTokenizer(), "JACCARD", t)
    cand = _pairs(f.filter_tables(A, B, "ID", "ID", "name", "name"))
    true = set(
        brute_force_set_sim(
            _rows(A), _rows(B), KEY_I, KEY_I, NAME_I, NAME_I,
            WhitespaceTokenizer(), "jaccard", t,
        )
    )
    assert true <= cand, f"missing true matches: {true - cand}"
    # and the filter agrees with its own scalar semantics
    a_rows = {r[0]: r[1] for r in _rows(A)}
    b_rows = {r[0]: r[1] for r in _rows(B)}
    exp = {
        (la, rb)
        for la, lv in a_rows.items()
        for rb, rv in b_rows.items()
        if lv is not None and rv is not None and not f.filter_pair(lv, rv)
    }
    assert cand == exp, f"extra={cand - exp} missing={exp - cand}"


def test_overlap_filter_tables(spark, person_tables):
    A, B = person_tables
    f = OverlapFilter(WhitespaceTokenizer(), 1)
    cand = _pairs(f.filter_tables(A, B, "ID", "ID", "name", "name"))
    a_rows = {r[0]: r[1] for r in _rows(A)}
    b_rows = {r[0]: r[1] for r in _rows(B)}
    exp = {
        (la, rb)
        for la, lv in a_rows.items()
        for rb, rv in b_rows.items()
        if lv is not None and rv is not None and not f.filter_pair(lv, rv)
    }
    assert cand == exp


def test_size_filter_tables(spark, person_tables):
    A, B = person_tables
    f = SizeFilter(WhitespaceTokenizer(), "JACCARD", 0.5)
    cand = _pairs(f.filter_tables(A, B, "ID", "ID", "name", "name"))
    a_rows = {r[0]: r[1] for r in _rows(A)}
    b_rows = {r[0]: r[1] for r in _rows(B)}
    exp = {
        (la, rb)
        for la, lv in a_rows.items()
        for rb, rv in b_rows.items()
        if lv is not None and rv is not None and not f.filter_pair(lv, rv)
    }
    assert cand == exp


def test_filter_candset(spark, person_tables):
    A, B = person_tables
    base = OverlapFilter(WhitespaceTokenizer(), 1).filter_tables(
        A, B, "ID", "ID", "name", "name"
    )
    refined = SizeFilter(WhitespaceTokenizer(), "JACCARD", 0.8).filter_candset(
        base, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name"
    )
    got = _pairs(refined)
    f = SizeFilter(WhitespaceTokenizer(), "JACCARD", 0.8)
    a_rows = {r[0]: r[1] for r in _rows(A)}
    b_rows = {r[0]: r[1] for r in _rows(B)}
    exp = {
        (la, rb)
        for (la, rb) in _pairs(base)
        if not f.filter_pair(a_rows[la], b_rows[rb])
    }
    assert got == exp
    assert refined.columns == base.columns


def test_filter_tables_out_attrs(spark, person_tables):
    A, B = person_tables
    out = OverlapFilter(WhitespaceTokenizer(), 1).filter_tables(
        A, B, "ID", "ID", "name", "name",
        l_out_attrs=["name"], r_out_attrs=["name", "zipcode"],
    )
    assert out.columns == ["l_ID", "r_ID", "l_name", "r_name", "r_zipcode"]


def _suffix_table_oracle(a_rows, b_rows, f, measure, threshold, qval):
    """Reference SuffixFilter.filter_tables semantics (suffix_filter.py:427-531):
    GLOBAL two-table token ordering, per-pair prefix/suffix split, the
    lpl/rpl >= alpha short-circuit, then the recursive hamming LB."""
    import collections

    from py_stringsimjoin_spark.plans import filter_math as fm

    cnt = collections.Counter()
    toks = {}
    for k, v in list(a_rows.items()) + list(b_rows.items()):
        ts = f.tokenizer.tokenize(v) if v is not None else None
        toks[k] = ts
        if ts:
            cnt.update(ts)
    order = {t: i for i, (c, t) in enumerate(sorted((c, t) for t, c in cnt.items()))}
    ranked = {k: (sorted(order[t] for t in ts) if ts is not None else None) for k, ts in toks.items()}
    expect = set()
    for lk in a_rows:
        ls = ranked[lk]
        if ls is None:
            continue
        ln = len(ls)
        lpl = fm.prefix_length(ln, measure, threshold, qval) if ln else 0
        for rk in b_rows:
            rs = ranked[rk]
            if rs is None:
                continue
            rn = len(rs)
            if ln == 0 and rn == 0:
                if f.allow_empty and measure in ("jaccard", "cosine", "dice"):
                    expect.add((lk, rk))
                continue
            rpl = fm.prefix_length(rn, measure, threshold, qval) if rn else 0
            if lpl <= 0 or rpl <= 0:
                continue
            alpha = fm.overlap_threshold(ln, rn, measure, threshold, qval)
            if lpl >= alpha and rpl >= alpha:
                expect.add((lk, rk))
                continue
            hm = ln + rn - 2 * alpha
            if f._hamming_lb(ls[lpl:], rs[rpl:], ln - lpl, rn - rpl, hm, 1) <= hm:
                expect.add((lk, rk))
    return expect


@pytest.mark.parametrize("mlabel,measure,threshold", [
    ("JACCARD", "jaccard", 0.6),
    ("COSINE", "cosine", 0.8),
])
def test_suffix_filter_tables(spark, person_tables, mlabel, measure, threshold):
    A, B = person_tables
    tok = WhitespaceTokenizer(return_set=True)
    f = SuffixFilter(tok, mlabel, threshold)
    out = f.filter_tables(A, B, "ID", "ID", "name", "name")
    got = _pairs(out)
    a_rows = {r[0]: r[1] for r in _rows(A)}
    b_rows = {r[0]: r[1] for r in _rows(B)}
    exp = _suffix_table_oracle(a_rows, b_rows, f, measure, threshold, None)
    assert got == exp
    assert len(got) > 0


def test_filter_rejects_numeric_attr(spark, person_tables):
    A, B = person_tables
    with pytest.raises(AssertionError, match="not of string type"):
        OverlapFilter(WhitespaceTokenizer(), 1).filter_tables(
            A, B, "ID", "ID", "birth_year", "name"
        )


def test_overlap_filter_rejects_bad_comp_op():
    with pytest.raises(AssertionError):
        OverlapFilter(WhitespaceTokenizer(), 1, comp_op="<=")
