"""Bundled demo datasets, synthesized deterministically.

The reference ships two CSV datasets (person 7/8 rows, books ~3k rows;
loaders at /root/reference/py_stringsimjoin/datasets/base.py:10-27). No
external data exists here, so these loaders generate schema-identical
deterministic tables (FIXTURES.md §2-3).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession


def load_person_dataset(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """The reference's unit-test person tables A (7 rows) and B (8 rows),
    including the whitespace-only and NULL name corner rows."""
    cols = ["ID", "name", "birth_year", "hourly_wage", "address", "zipcode"]
    a_rows = [
        ("a1", "Kevin Smith", 1989, 30.0, "607 From St, San Francisco", 94107),
        ("a2", "Oliver A.", 1988, 21.5, "558 Hansen St, Palo Alto", 94301),
        ("a3", "James Jordan Jr.", 1981, 35.5, "470 Doker Ln, Fremont", 94555),
        ("a4", "Basil Nash", 1992, 26.0, "803 Bonita Ave, Oakland", 94609),
        ("a5", "Alexander Porter", 1983, 32.5, "108 Clarke Ave, San Jose", 95121),
        ("a6", " ", 1985, 25.0, "98 10th St, Mountain View", 94035),
        ("a7", None, 1986, 28.0, "44 Boone St, Milpitas", 95035),
    ]
    b_rows = [
        ("b1", "Mark Levene", 1987, 29.5, "108 Clarke Ave, San Jose", 95121),
        ("b2", "Kevin Smith", 1989, 30.0, "607 From St, San Francisco", 94107),
        ("b3", "Oliver Amos", 1988, 21.5, "558 Hansen St, Palo Alto", 94301),
        ("b4", "James Jordan", 1981, 35.5, "470 Doker Ln, Fremont", 94555),
        ("b5", "Bazil Nash", 1992, 26.0, "803 Bonita Ave, Oakland", 94609),
        ("b6", "Alex Porter", 1983, 32.5, "108 Clarke Ave, San Jose", 95121),
        ("b7", " ", 1985, 25.0, "98 10th St, Mountain View", 94035),
        ("b8", None, 1986, 28.0, "44 Boone St, Milpitas", 95035),
    ]
    return spark.createDataFrame(a_rows, cols), spark.createDataFrame(b_rows, cols)


_TITLE_WORDS = (
    "the of and secret lost hidden silent broken golden iron last first "
    "night day river mountain city garden house road war peace journey "
    "history art science guide introduction handbook stories tales life"
).split()
_PUBLISHERS = ["Harper", "Penguin", "Norton", "Vintage", "Scholastic", "Orbit"]


def _book_row(rng: random.Random, i: int, prefix: str):
    title = " ".join(rng.choice(_TITLE_WORDS) for _ in range(rng.randint(2, 6))).title()
    author = f"{rng.choice('ABCDEFGHJKLM')}. {rng.choice(_TITLE_WORDS).title()}"
    price = f"${rng.randint(5, 80)}.{rng.randint(0, 99):02d} "
    isbn = 9780000000000 + rng.randint(10**9, 10**10 - 1)
    pages = rng.randint(80, 900) if rng.random() > 0.05 else None
    dims = f"{rng.randint(5, 9)}.{rng.randint(0, 9)} x {rng.randint(7, 11)}.{rng.randint(0, 9)} inches"
    pub_date = f"{rng.randint(1, 12)}/{rng.randint(1, 28)}/{rng.randint(80, 99)}"
    return (
        f"{prefix}{i:04d}", title, price, author, str(isbn),
        rng.choice(_PUBLISHERS), pub_date, pages, dims,
    )


def load_books_dataset(
    spark: SparkSession, n_a: int = 3000, n_b: int = 3000, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Schema-identical stand-in for the books demo dataset: B shares ~30% of
    A's titles with small perturbations (realistic fuzzy-join workload)."""
    schema = (
        "ID string, Title string, Price string, Author string, ISBN13 string, "
        "Publisher string, Publication_Date string, Pages int, Dimensions string"
    )
    rng = random.Random(seed)
    a_rows = [_book_row(rng, i, "BN") for i in range(n_a)]
    b_rows = []
    for i in range(n_b):
        if i < int(n_b * 0.3) and i < len(a_rows):
            r = list(_book_row(random.Random(f"{seed}:b{i}"), i, "HC"))
            src_title = a_rows[i][1]
            words = src_title.split()
            if len(words) > 1 and rng.random() < 0.5:
                words.pop(rng.randrange(len(words)))
            r[1] = " ".join(words)
            b_rows.append(tuple(r))
        else:
            b_rows.append(_book_row(rng, i, "HC"))
    return spark.createDataFrame(a_rows, schema), spark.createDataFrame(b_rows, schema)
