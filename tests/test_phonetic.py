"""Soundex encoding (cross-engine spec) + phonetic blocking."""

import duckdb
import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.phonetic import (
    soundex_blocking_pairs,
    soundex_column,
    soundex_duckdb_sql,
)

# canonical American-Soundex vectors (US Census / Knuth)
VECTORS = [
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Ashcraft", "A261"),  # H/W rule: S,C separated by H coded once
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),  # vowel separates Z,K → coded twice
    ("Pfister", "P236"),  # first letter dedups with same-code follower
    ("Honeyman", "H555"),
    ("Jackson", "J250"),
    ("Washington", "W252"),
    ("Lee", "L000"),
    ("Gutierrez", "G362"),
    ("VanDeusen", "V532"),
    ("", ""),
    ("123", ""),
    (None, None),
    ("o'Brien", "O165"),
]


def test_soundex_classic_vectors(spark):
    df = spark.createDataFrame([(s,) for s, _ in VECTORS], "s string")
    got = [r["c"] for r in df.select(soundex_column(F.col("s")).alias("c")).collect()]
    assert got == [c for _, c in VECTORS]


def test_soundex_duckdb_parity(spark):
    """The Spark expression and the DuckDB mirror produce identical codes
    over the vectors plus a seeded random word grid."""
    import random

    rng = random.Random(3)
    words = [s for s, _ in VECTORS if s] + [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz '") for _ in range(rng.randint(1, 12)))
        for _ in range(500)
    ]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = [r["c"] for r in df.select(soundex_column(F.col("s")).alias("c")).collect()]
    con = duckdb.connect()
    sql = soundex_duckdb_sql("s")
    want = [
        con.execute(f"select {sql} from (select ? as s)", [w]).fetchone()[0]
        for w in words
    ]
    assert got == want


def test_soundex_blocking_pairs(spark):
    rows = [
        (1, "Robert"), (2, "Rupert"), (3, "Ashcraft"), (4, "Ashcroft"),
        (5, "Tymczak"), (6, "Jackson"), (7, ""), (8, None),
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    pairs = soundex_blocking_pairs(df, df, "id", "id", "name", "name")
    got = {
        (r["l_id"], r["r_id"])
        for r in pairs.where(F.col("l_id") < F.col("r_id")).collect()
    }
    assert got == {(1, 2), (3, 4)}  # R163 and A261 blocks; empty/null never


def test_soundex_blocking_purges_big_blocks(spark):
    rows = [(i, "Robert") for i in range(10)] + [(100, "Ashcraft"), (101, "Ashcroft")]
    df = spark.createDataFrame(rows, "id int, name string")
    pairs = soundex_blocking_pairs(df, df, "id", "id", "name", "name", max_block_size=5)
    got = {
        (r["l_id"], r["r_id"])
        for r in pairs.where(F.col("l_id") < F.col("r_id")).collect()
    }
    assert got == {(100, 101)}  # the 10-row R163 block is purged


def test_soundex_blocking_two_tables(spark):
    a = spark.createDataFrame([(1, "Smith"), (2, "Tymczak")], "id int, name string")
    b = spark.createDataFrame([(9, "Smyth"), (8, "Jackson")], "id int, name string")
    pairs = soundex_blocking_pairs(a, b, "id", "id", "name", "name")
    got = {(r["l_id"], r["r_id"]) for r in pairs.collect()}
    assert got == {(1, 9)}  # Smith/Smyth → S530
