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


def test_jaro_kernels_duckdb_parity():
    """batch_jaro / batch_jaro_winkler are bit-exact vs DuckDB's
    jaro_similarity / jaro_winkler_similarity (the oracle the driver runs)
    over a seeded random grid incl. unicode, empties, and long strings."""
    import random

    import duckdb

    from py_stringsimjoin_spark.functions.sims import batch_jaro, batch_jaro_winkler

    rng = random.Random(7)
    alpha = "abcde XY-é漢'"
    pairs = [
        ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""), ("a", ""),
        ("a", "a"), ("ab", "ba"), ("abcdef", "bcadef"), ("ééé", "ééx"),
        ("DwAyNE", "DuANE"), ("abcdxxxx", "abcdyyyyzzzz"),
        ("ab", "abcdefghijklmn"), ("x" * 60, "x" * 59 + "y"),
    ]
    for _ in range(800):
        pairs.append((
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14))),
        ))
    ls = [p[0] for p in pairs]
    rs = [p[1] for p in pairs]
    j = batch_jaro(ls, rs)
    jw = batch_jaro_winkler(ls, rs)
    con = duckdb.connect()
    for i, (a, b) in enumerate(pairs):
        dj = con.execute("select jaro_similarity(?,?)", [a, b]).fetchone()[0]
        djw = con.execute(
            "select jaro_winkler_similarity(?,?)", [a, b]
        ).fetchone()[0]
        assert j[i] == dj, (a, b, j[i], dj)
        assert jw[i] == djw, (a, b, jw[i], djw)


def test_apply_matcher_jaro_winkler(spark, person_tables):
    A, B = person_tables
    cand = _candset(A, B)
    out = apply_matcher(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        None, "jaro_winkler", 0.8,
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    assert got[("a1", "b2")] == 1.0  # Kevin Smith / Kevin Smith
    assert ("a4", "b5") in got  # Basil Nash / Bazil Nash: one substitution
    from py_stringsimjoin_spark.functions.sims import batch_jaro_winkler

    assert got[("a4", "b5")] == batch_jaro_winkler(["Basil Nash"], ["Bazil Nash"])[0]


def test_apply_matcher_unknown_measure_name(spark, person_tables):
    A, B = person_tables
    cand = _candset(A, B)
    out = apply_matcher(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        None, "jaroo", 0.8,
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown measure name"):
        out.collect()


def test_monge_elkan_kernel_duckdb_parity():
    """batch_monge_elkan is bit-exact vs the DuckDB nested-lambda
    formulation the driver oracle uses (list_reduce sequential fold over
    per-left-token max inner jaro[_winkler]) on a seeded random token grid
    incl. repeated tokens, unicode, and empty bags."""
    import random

    import duckdb

    from py_stringsimjoin_spark.functions.sims import batch_monge_elkan

    rng = random.Random(11)
    words = ["paul", "johnson", "jônsen", "kevin", "smith", "smyth", "x", "漢字"]
    bags = [[], ["paul"], ["paul", "paul", "jon"]]
    for _ in range(120):
        bags.append([rng.choice(words) for _ in range(rng.randint(1, 6))])
    pairs = [(bags[rng.randrange(len(bags))], bags[rng.randrange(len(bags))])
             for _ in range(300)]
    ls = [p[0] for p in pairs]
    rs = [p[1] for p in pairs]
    con = duckdb.connect()
    for inner, fn in (("jaro_winkler", "jaro_winkler_similarity"),
                      ("jaro", "jaro_similarity")):
        mine = batch_monge_elkan(ls, rs, inner=inner)
        q = f"""
        SELECT CASE WHEN len(?) = 0 AND len(?) = 0 THEN CAST('1.0' AS DOUBLE)
                    WHEN len(?) = 0 OR len(?) = 0 THEN CAST('0.0' AS DOUBLE)
               ELSE list_reduce(
                      list_transform(?, x -> list_max(
                        list_transform(?, y -> {fn}(x, y)))),
                      (acc, x) -> acc + x) / len(?)
               END"""
        for i, (a, b) in enumerate(pairs):
            d = con.execute(q, [a, b, a, b, a, b, a]).fetchone()[0]
            assert mine[i] == d, (inner, a, b, mine[i], d)


def test_apply_matcher_monge_elkan(spark, person_tables):
    """monge_elkan measure through apply_matcher: exact bags score 1.0,
    near-duplicate names survive a 0.85 threshold, and the score equals the
    kernel applied to the whitespace bags (asymmetric: left-bag average)."""
    from py_stringsimjoin_spark.functions.sims import batch_monge_elkan
    from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer

    A, B = person_tables
    cand = _candset(A, B)
    out = apply_matcher(
        cand, "l_ID", "r_ID", A, B, "ID", "ID", "name", "name",
        WhitespaceTokenizer(return_set=False), "monge_elkan", 0.85,
    )
    got = {(r["l_ID"], r["r_ID"]): r["_sim_score"] for r in out.collect()}
    assert got[("a1", "b2")] == 1.0  # identical names
    assert ("a4", "b5") in got  # Basil Nash / Bazil Nash
    assert got[("a4", "b5")] == batch_monge_elkan(
        [["Basil", "Nash"]], [["Bazil", "Nash"]]
    )[0]
    # asymmetry: ME averages over the LEFT bag
    me_lr = batch_monge_elkan([["kevin", "smith", "jr"]], [["kevin"]])[0]
    me_rl = batch_monge_elkan([["kevin"]], [["kevin", "smith", "jr"]])[0]
    assert me_lr != me_rl and me_rl == 1.0
