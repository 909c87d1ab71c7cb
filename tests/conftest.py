from __future__ import annotations

import pytest

from py_stringsimjoin_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def person_tables(spark):
    """Mirror of the reference unit-test fixtures
    (/root/reference/py_stringsimjoin/tests/data/table_A.csv, table_B.csv):
    includes a whitespace-only name (empty token set) and a NULL name."""
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
    cols = ["ID", "name", "birth_year", "hourly_wage", "address", "zipcode"]
    A = spark.createDataFrame(a_rows, cols)
    B = spark.createDataFrame(b_rows, cols)
    return A, B
