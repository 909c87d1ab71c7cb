"""Seeded adversarial fuzz of the URL triple form: Spark expression,
Python reference, and DuckDB SQL must agree byte-for-byte on generated
URL-ish garbage (fragment soup, stray delimiters, unicode, whitespace)."""

import random

import duckdb
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

FRAGS = [
    "https://", "http://", "HTTPS://", "ftp://", "", "www.", "WWW.",
    "user:p@", "@", "example", ".com", ".co.uk", ":443", ":80", ":8080",
    ":0080", ":", "/", "//", "/path", "/Path", "?", "?a=1", "?b=2&a=1",
    "&", "?utm_source=x", "#", "#frag", "?#", "é", "ß", "İ", "漢", " ",
    "\t", "%20", "..", "-", "_", "~", "?ref", "?ref=x&ref=y", "?a", "?=",
    "?a==b", "??", "###",
]


def _cases(seed, n=400):
    rng = random.Random(seed)
    return [
        "".join(rng.choice(FRAGS) for _ in range(rng.randrange(1, 8)))
        for _ in range(n)
    ]


def test_three_engine_fuzz(spark):
    cases = _cases(20260818)
    py = [
        (normalize_url(c), url_host(c), url_registrable_domain(c))
        for c in cases
    ]

    con = duckdb.connect()
    con.execute("create table u (i int, url varchar)")
    con.executemany("insert into u values (?,?)", list(enumerate(cases)))
    duck = con.execute(
        f"select i, {normalize_url_sql('url')}, {url_host_sql('url')}, "
        f"{url_registrable_domain_sql('url')} from u order by i"
    ).fetchall()
    for i, c, h, d in duck:
        assert (c, h, d) == py[i], f"duckdb vs python on {cases[i]!r}"

    sdf = spark.createDataFrame(list(enumerate(cases)), "i int, url string")
    got = {
        r.i: (r.c, r.h, r.d)
        for r in sdf.select(
            "i",
            normalize_url_expr(F.col("url")).alias("c"),
            url_host_expr(F.col("url")).alias("h"),
            url_registrable_domain_expr(F.col("url")).alias("d"),
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == py[i], f"spark vs python on {c!r}"
