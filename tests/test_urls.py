"""URL canonicalization: three-engine bit parity + the dedup operator.

The Spark expression form, the Python reference form, and the DuckDB SQL
form must agree byte-for-byte on every case — the driver's oracle gate
depends on it (same contract as the tokenizers/soundex triples).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.functions.urls import (
    normalize_url,
    normalize_url_expr,
    normalize_url_sql,
    url_host,
    url_host_expr,
    url_host_sql,
    url_registrable_domain,
    url_registrable_domain_expr,
    url_registrable_domain_sql,
)

CASES = [
    # scheme/host case, www, default ports
    "https://WWW.Example.COM:443/Path/To/X",
    "http://example.com:80/a",
    "HTTP://USER:pw@Example.com/a",
    "https://example.com:8443/a",
    # trailing slashes, root path, empty path
    "https://example.com/",
    "https://example.com",
    "https://example.com/a/b///",
    # query: tracking params, ordering, valueless params, fragments
    "https://example.com/p?utm_source=x&b=2&a=1#frag",
    "https://example.com/p?b=2&a=1",
    "https://example.com/p?a=1&b=2",
    "https://example.com/p?utm_campaign=z&gclid=abc&fbclid=1&ref=hn",
    "https://example.com/p?utm_medium",
    "https://example.com/p?",
    "https://example.com/p?a=1&&b=2",
    "https://example.com/p#only-frag",
    "https://example.com/p#frag?not=query",
    # case-significant path/query survive
    "https://example.com/CaseSensitive?Key=Value",
    # ports on odd schemes, multi-label hosts, registrable domains
    "ftp://Example.org:21/file",
    "https://a.b.news.co.uk/x",
    "https://deep.sub.example.com/x",
    "https://localhost/x",
    "https://example.co.jp:443/x",
    # non-hierarchical / junk inputs pass through trimmed
    "  example.com/no-scheme  ",
    "mailto:someone@example.com",
    "",
    "   ",
    None,
    # whitespace around a real URL
    "  https://www.example.com/a  ",
]


@pytest.fixture(scope="module")
def triples(spark):
    rows = [(i, u) for i, u in enumerate(CASES)]
    sdf = spark.createDataFrame(rows, "i int, url string")
    out = sdf.select(
        "i",
        normalize_url_expr(F.col("url")).alias("canon"),
        url_host_expr(F.col("url")).alias("host"),
        url_registrable_domain_expr(F.col("url")).alias("dom"),
    ).collect()
    spark_res = {r.i: (r.canon, r.host, r.dom) for r in out}

    con = duckdb.connect()
    con.execute("create table u (i int, url varchar)")
    con.executemany("insert into u values (?, ?)", rows)
    duck = con.execute(
        f"select i, {normalize_url_sql('url')}, {url_host_sql('url')}, "
        f"{url_registrable_domain_sql('url')} from u"
    ).fetchall()
    duck_res = {r[0]: (r[1], r[2], r[3]) for r in duck}
    return spark_res, duck_res


def test_three_engine_parity(triples):
    spark_res, duck_res = triples
    for i, u in enumerate(CASES):
        py = (normalize_url(u), url_host(u), url_registrable_domain(u))
        assert spark_res[i] == py, f"spark vs python on {u!r}: {spark_res[i]} != {py}"
        assert duck_res[i] == py, f"duckdb vs python on {u!r}: {duck_res[i]} != {py}"


def test_normalization_semantics():
    n = normalize_url
    # the recrawl variants of one resource collapse to one key
    assert (
        n("https://WWW.Example.COM:443/a/?utm_source=x")
        == n("https://example.com/a")
        == "https://example.com/a"
    )
    # parameter order is canonicalized, values survive
    assert n("https://e.com/p?b=2&a=1") == "https://e.com/p?a=1&b=2"
    # distinct queries stay distinct
    assert n("https://e.com/p?a=1") != n("https://e.com/p?a=2")
    # non-default port is preserved
    assert n("https://e.com:8443/a") == "https://e.com:8443/a"
    # path case is significant
    assert n("https://e.com/A") != n("https://e.com/a")
    # no scheme -> passthrough (trimmed)
    assert n(" e.com/x ") == "e.com/x"
    assert n(None) is None
    # registrable domains: two-level public suffixes
    assert url_registrable_domain("https://a.b.news.co.uk/x") == "news.co.uk"
    assert url_registrable_domain("https://deep.sub.example.com/") == "example.com"
    assert url_registrable_domain("https://localhost/") == "localhost"


def test_canonical_url_groups(spark):
    from py_stringsimjoin_spark import canonical_url_groups

    df = spark.createDataFrame(
        [
            (1, "https://WWW.Example.COM/a/?utm_source=t"),
            (2, "http://example.com/a"),       # different scheme -> NOT grouped with 1
            (3, "https://example.com/a"),      # same as 1
            (4, "https://example.com/b?x=1&y=2"),
            (5, "https://example.com/b?y=2&x=1"),  # same as 4 (order)
            (6, "https://other.org/z"),        # singleton -> excluded
        ],
        "id long, url string",
    )
    out = canonical_url_groups(df, "id", "url").collect()
    groups = {}
    for r in out:
        groups.setdefault(r.group_id, set()).add(r.id)
        assert r.group_size == 2
    assert groups == {1: {1, 3}, 4: {4, 5}}
    canon = {r.id: r.canonical_url for r in out}
    assert canon[1] == canon[3] == "https://example.com/a"
    assert canon[4] == canon[5] == "https://example.com/b?x=1&y=2"
