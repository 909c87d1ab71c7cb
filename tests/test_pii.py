"""PII redaction: three-engine bit parity + semantics + the scan operator.

Same contract as the URL/tokenizer/soundex triples: the Spark expression
form, the Python reference form, and the DuckDB SQL form must agree
byte-for-byte on every case (the driver's oracle gate replays the DuckDB
form)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.functions.pii import (
    PII_CLASSES,
    pii_count_expr,
    pii_count_sql,
    pii_counts,
    redact_pii,
    redact_pii_expr,
    redact_pii_sql,
)

CASES = [
    # emails — plain, subaddress, dotted local, uppercase, adjacent text
    "contact me at john.doe@example.com today",
    "x+tag@sub.domain.co.uk,then more",
    "A@B.CO",
    "not-an-email @ example.com",
    "double a@b.com b@c.org hits",
    # ipv4 — plain, loose >255 octets (spec: accepted), 5-dotted runs,
    # version strings (3 groups: not an IP)
    "server at 192.168.0.1 port 80",
    "loose 999.999.999.999 accepted",
    "run 1.2.3.4.5 leaves a tail",
    "version 1.2.3 is not an ip",
    "10.0.0.255.",
    # ipv6 full form only
    "fe80:0000:0000:0000:0202:b3ff:fe1e:8329 works",
    "compressed fe80::1 is out of scope",
    # credit cards
    "pay 4111 1111 1111 1111 now",
    "or 4111-1111-1111-1111 dashed",
    "but 41111111111111111 unseparated is not matched",
    # ssn
    "ssn 123-45-6789 here",
    "not 1234-45-6789",
    # phones — +CC, parenthesised, separated; bare 10 digits NOT matched
    "+1 555-123-4567 direct",
    "+44 20 7946 0958 is not a NANP shape and may not match",
    "(555) 123-4567 office",
    "555.123.4567 dotted",
    "5551234567 bare run stays",
    "id 123-456-78901 is not a phone (11th digit breaks the boundary)",
    # mixtures and boundaries
    "mail a@b.io call (555) 123-4567 ip 10.0.0.1 ssn 123-45-6789",
    "",
    "   ",
    None,
]


@pytest.fixture(scope="module")
def engines(spark):
    rows = [(i, s) for i, s in enumerate(CASES)]
    sdf = spark.createDataFrame(rows, "i int, t string")
    count_cols = [
        pii_count_expr(F.col("t"), name).alias(f"n_{name}")
        for name, _, _ in PII_CLASSES
    ]
    out = sdf.select(
        "i", redact_pii_expr(F.col("t")).alias("red"), *count_cols
    ).collect()
    spark_res = {
        r.i: (r.red, tuple(r[f"n_{name}"] for name, _, _ in PII_CLASSES))
        for r in out
    }

    con = duckdb.connect()
    con.execute("create table t (i int, t varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    count_sql = ", ".join(
        pii_count_sql("t", name) for name, _, _ in PII_CLASSES
    )
    duck = con.execute(
        f"select i, {redact_pii_sql('t')}, {count_sql} from t"
    ).fetchall()
    duck_res = {r[0]: (r[1], tuple(r[2:])) for r in duck}
    return spark_res, duck_res


def test_three_engine_parity(engines):
    spark_res, duck_res = engines
    for i, s in enumerate(CASES):
        red = redact_pii(s)
        cnt = pii_counts(s)
        py = (
            red,
            tuple(None for _ in PII_CLASSES)
            if cnt is None
            else tuple(cnt[name] for name, _, _ in PII_CLASSES),
        )
        assert spark_res[i] == py, f"spark vs python on {s!r}: {spark_res[i]} != {py}"
        assert duck_res[i] == py, f"duckdb vs python on {s!r}: {duck_res[i]} != {py}"


def test_redaction_semantics():
    r = redact_pii
    assert r("mail john.doe@example.com now") == "mail <EMAIL> now"
    assert r("ip 192.168.0.1") == "ip <IP>"
    # loose-octet spec: recall over precision
    assert r("999.999.999.999") == "<IP>"
    # three-group version strings survive
    assert r("version 1.2.3") == "version 1.2.3"
    # five-dotted run: leftmost quad is taken, tail survives (spec'd)
    assert r("1.2.3.4.5") == "<IP>.5"
    assert r("pay 4111 1111 1111 1111") == "pay <CREDIT_CARD>"
    assert r("ssn 123-45-6789") == "ssn <SSN>"
    assert r("+1 555-123-4567") == "<PHONE>"
    assert r("(555) 123-4567") == "<PHONE>"
    assert r("555.123.4567") == "<PHONE>"
    # bare digit runs are NOT phones/cards (precision rule)
    assert r("5551234567") == "5551234567"
    assert r("41111111111111111") == "41111111111111111"
    # NULL passthrough, class subsetting, canonical order
    assert r(None) is None
    assert redact_pii("a@b.io 10.0.0.1", classes=["email"]) == "<EMAIL> 10.0.0.1"
    assert redact_pii("a@b.io 10.0.0.1", classes=["ipv4", "email"]) == "<EMAIL> <IP>"
    with pytest.raises(AssertionError):
        redact_pii("x", classes=["nope"])


def test_counts_on_raw_text():
    c = pii_counts("a@b.io c@d.io 10.0.0.1 123-45-6789")
    assert c["email"] == 2 and c["ipv4"] == 1 and c["ssn"] == 1
    assert c["phone"] == 0 and c["credit_card"] == 0 and c["ipv6"] == 0
    assert pii_counts(None) is None


def test_pii_stats_operator(spark):
    from py_stringsimjoin_spark.operators.pii import pii_stats

    rows = [
        (1, "write a@b.com or call (555) 123-4567"),
        (2, "clean text with no identifiers"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in pii_stats(df, "doc_id", "text").collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1 and out[1].has_pii
    assert out[1].redacted_text == "write <EMAIL> or call <PHONE>"
    assert out[2].has_pii is False and out[2].redacted_text == rows[1][1]
    assert out[3].has_pii is None and out[3].redacted_text is None

    # plan guard: map-only, Python-free, no exchange
    plan = pii_stats(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_pii_scrub_streams(spark, tmp_path):
    """The scrub pass is a stateless projection, so the SAME operator runs
    under Structured Streaming unchanged — the deployment shape for
    scrubbing documents as they are crawled."""
    import os

    from py_stringsimjoin_spark.operators.pii import pii_stats

    src = str(tmp_path / "incoming")
    os.makedirs(src)
    spark.createDataFrame(
        [
            (1, "mail a@b.com now"),
            (2, "call (555) 123-4567"),
            (3, "nothing here"),
        ],
        "doc_id int, text string",
    ).write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema("doc_id int, text string").parquet(src)
    out = pii_stats(stream, "doc_id", "text")
    q = (
        out.writeStream.format("memory")
        .queryName("pii_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.doc_id: r for r in spark.sql("select * from pii_sink").collect()}
    finally:
        q.stop()
    assert rows[1].redacted_text == "mail <EMAIL> now" and rows[1].has_pii
    assert rows[2].n_phone == 1
    assert rows[3].has_pii is False
