"""Randomized cross-engine tokenizer parity: the Python form vs the DuckDB
SQL form over arbitrary unicode-ish strings. The Spark form is covered by
the fixed-case tests in test_tokenizers.py (one JVM round-trip per class);
this file hammers the two cheap engines with hypothesis so corner cases
(regex-special delimiters, empty runs, non-ASCII, pad collisions) can't
hide. Tokens are compared as sorted multisets — the joins consume token
(multi)sets, and DuckDB's list_distinct does not preserve order.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from py_stringsimjoin_spark.functions.tokenizers import (
    AlphabeticTokenizer,
    AlphanumericTokenizer,
    DelimiterTokenizer,
    QgramTokenizer,
    ShingleTokenizer,
    WhitespaceTokenizer,
)

# printable-ish alphabet incl. regex specials, whitespace, digits, non-ASCII
_ALPHABET = "ab c,.|()[]{}^$*+?\\-9é\t"
_strings = st.text(alphabet=_ALPHABET, max_size=30)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _check(con, tok, s):
    exp = tok.tokenize(s)
    got = con.execute(
        f"select {tok.duckdb_sql('s')} from (select ? as s)", [s]
    ).fetchone()[0]
    assert sorted(got) == sorted(exp), (tok, repr(s), got, exp)


@settings(max_examples=150, deadline=None)
@given(s=_strings, rs=st.booleans())
def test_whitespace_py_vs_duckdb(con, s, rs):
    _check(con, WhitespaceTokenizer(return_set=rs), s)


@settings(max_examples=150, deadline=None)
@given(
    s=_strings,
    rs=st.booleans(),
    delims=st.lists(
        st.text(alphabet=_ALPHABET, min_size=1, max_size=3), min_size=1, max_size=3
    ),
)
def test_delimiter_py_vs_duckdb(con, s, rs, delims):
    _check(con, DelimiterTokenizer(delims, return_set=rs), s)


@settings(max_examples=150, deadline=None)
@given(
    s=_strings,
    rs=st.booleans(),
    q=st.integers(min_value=1, max_value=4),
    padding=st.booleans(),
)
def test_qgram_py_vs_duckdb(con, s, rs, q, padding):
    _check(con, QgramTokenizer(qval=q, padding=padding, return_set=rs), s)


@settings(max_examples=150, deadline=None)
@given(s=_strings, rs=st.booleans(), cls=st.sampled_from([AlphanumericTokenizer, AlphabeticTokenizer]))
def test_alnum_alpha_py_vs_duckdb(con, s, rs, cls):
    _check(con, cls(return_set=rs), s)


@settings(max_examples=150, deadline=None)
@given(s=_strings, rs=st.booleans(), n=st.integers(min_value=1, max_value=3))
def test_shingle_py_vs_duckdb(con, s, rs, n):
    _check(con, ShingleTokenizer(n=n, return_set=rs), s)
