from pyspark.sql import functions as F

from py_stringsimjoin_spark.functions.tokenizers import (
    QgramTokenizer,
    WhitespaceTokenizer,
)


def _spark_tokenize(spark, tok, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], ["i", "s"])
    rows = (
        df.withColumn("t", tok.spark_col(F.col("s"))).orderBy("i").select("t").collect()
    )
    return [r["t"] for r in rows]


def test_whitespace_matches_python(spark):
    vals = ["Kevin Smith", "  a   b  ", " ", "", "one", None, "a a b"]
    for return_set in (True, False):
        tok = WhitespaceTokenizer(return_set=return_set)
        got = _spark_tokenize(spark, tok, vals)
        exp = [tok.tokenize(v) for v in vals]
        assert got == exp


def test_whitespace_set_vs_bag():
    assert WhitespaceTokenizer(True).tokenize("a a b") == ["a", "b"]
    assert WhitespaceTokenizer(False).tokenize("a a b") == ["a", "a", "b"]


def test_qgram_matches_python(spark):
    vals = ["data", "ab", "a", "", " ", None, "héllo"]
    for q, padding, rs in [(2, True, False), (2, True, True), (3, True, False), (2, False, False), (3, False, True)]:
        tok = QgramTokenizer(qval=q, padding=padding, return_set=rs)
        got = _spark_tokenize(spark, tok, vals)
        exp = [tok.tokenize(v) for v in vals]
        assert got == exp, f"q={q} padding={padding} rs={rs}: {got} != {exp}"


def test_qgram_values():
    tok = QgramTokenizer(qval=2)
    assert tok.tokenize("ab") == ["#a", "ab", "b$"]
    tok3 = QgramTokenizer(qval=3, padding=False)
    assert tok3.tokenize("ab") == []
    assert tok3.tokenize("abcd") == ["abc", "bcd"]


def test_qgram_duckdb_parity():
    import duckdb

    for tok in [
        QgramTokenizer(qval=2),
        QgramTokenizer(qval=3, return_set=True),
        WhitespaceTokenizer(return_set=True),
        WhitespaceTokenizer(return_set=False),
    ]:
        con = duckdb.connect()
        for v in ["data science", "ab", "", " ", "a  b"]:
            sql = tok.duckdb_sql("s")
            got = con.execute(f"select {sql} from (select ? as s)", [v]).fetchone()[0]
            exp = tok.tokenize(v)
            assert sorted(got) == sorted(exp), (tok, v, got, exp)


def test_delimiter_values():
    from py_stringsimjoin_spark.functions.tokenizers import DelimiterTokenizer

    tok = DelimiterTokenizer([","])
    assert tok.tokenize("a,b,,c") == ["a", "b", "c"]
    assert tok.tokenize(",a,") == ["a"]
    assert tok.tokenize("") == []
    assert tok.tokenize(None) is None
    # multi-char delimiter, longest-first over an overlapping shorter one
    tok2 = DelimiterTokenizer([", ", ","])
    assert tok2.tokenize("a, b,c") == ["a", "b", "c"]
    # multiple delimiters incl. regex-special chars
    tok3 = DelimiterTokenizer([".", "|", " "])
    assert tok3.tokenize("a.b|c d") == ["a", "b", "c", "d"]
    # return_set: order-preserving distinct
    assert DelimiterTokenizer([","], return_set=True).tokenize("b,a,b") == ["b", "a"]
    assert DelimiterTokenizer([","], return_set=False).tokenize("b,a,b") == ["b", "a", "b"]
    import pytest

    with pytest.raises(ValueError):
        DelimiterTokenizer([])
    with pytest.raises(ValueError):
        DelimiterTokenizer([""])


def test_delimiter_matches_python(spark):
    from py_stringsimjoin_spark.functions.tokenizers import DelimiterTokenizer

    vals = ["a,b,,c", ",a,", "", "no-delims", None, "x, y,z", "a.b|c d", "b,a,b"]
    for delims in ([","], [", ", ","], [".", "|", " "], ["--"]):
        for rs in (True, False):
            tok = DelimiterTokenizer(delims, return_set=rs)
            got = _spark_tokenize(spark, tok, vals)
            exp = [tok.tokenize(v) for v in vals]
            assert got == exp, (delims, rs, got, exp)


def test_delimiter_duckdb_parity():
    import duckdb

    from py_stringsimjoin_spark.functions.tokenizers import DelimiterTokenizer

    con = duckdb.connect()
    vals = ["a,b,,c", ",a,", "", "no-delims", "x, y,z", "a.b|c d", "b,a,b", "a--b-c"]
    for delims in ([","], [", ", ","], [".", "|", " "], ["--"]):
        for rs in (True, False):
            tok = DelimiterTokenizer(delims, return_set=rs)
            sql = tok.duckdb_sql("s")
            for v in vals:
                got = con.execute(f"select {sql} from (select ? as s)", [v]).fetchone()[0]
                exp = tok.tokenize(v)
                # list_distinct does not preserve order in DuckDB; joins
                # consume tokens as (multi)sets, so sorted-equality is the
                # parity that matters (same convention as the q-gram test)
                assert sorted(got) == sorted(exp), (delims, rs, v, got, exp)


def test_alnum_alpha_values():
    from py_stringsimjoin_spark.functions.tokenizers import (
        AlphabeticTokenizer,
        AlphanumericTokenizer,
    )

    an = AlphanumericTokenizer()
    assert an.tokenize("data9,(science), 90") == ["data9", "science", "90"]
    assert an.tokenize("") == []
    assert an.tokenize("!!") == []
    assert an.tokenize(None) is None
    # non-ASCII letters act as separators (upstream ASCII regex semantics)
    assert an.tokenize("héllo") == ["h", "llo"]
    al = AlphabeticTokenizer()
    assert al.tokenize("data9sci 90 x") == ["data", "sci", "x"]
    assert AlphanumericTokenizer(return_set=True).tokenize("b a b") == ["b", "a"]
    assert AlphanumericTokenizer(return_set=False).tokenize("b a b") == ["b", "a", "b"]


def test_alnum_alpha_matches_python(spark):
    from py_stringsimjoin_spark.functions.tokenizers import (
        AlphabeticTokenizer,
        AlphanumericTokenizer,
    )

    vals = ["data9,(science), 90", "", "!!", None, "a1b2", "x  y-z", "héllo"]
    for cls in (AlphanumericTokenizer, AlphabeticTokenizer):
        for rs in (True, False):
            tok = cls(return_set=rs)
            got = _spark_tokenize(spark, tok, vals)
            exp = [tok.tokenize(v) for v in vals]
            assert got == exp, (cls.__name__, rs, got, exp)


def test_alnum_alpha_duckdb_parity():
    import duckdb

    from py_stringsimjoin_spark.functions.tokenizers import (
        AlphabeticTokenizer,
        AlphanumericTokenizer,
    )

    con = duckdb.connect()
    vals = ["data9,(science), 90", "", "!!", "a1b2", "x  y-z", "b a b", "héllo"]
    for cls in (AlphanumericTokenizer, AlphabeticTokenizer):
        for rs in (True, False):
            tok = cls(return_set=rs)
            sql = tok.duckdb_sql("s")
            for v in vals:
                got = con.execute(f"select {sql} from (select ? as s)", [v]).fetchone()[0]
                exp = tok.tokenize(v)
                assert sorted(got) == sorted(exp), (cls.__name__, rs, v, got, exp)
