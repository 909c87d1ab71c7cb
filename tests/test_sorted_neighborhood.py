"""Sorted-neighborhood blocking vs a brute-force Python reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.sorted_neighborhood import (
    global_sorted_positions,
    multipass_sorted_neighborhood,
    sorted_neighborhood_pairs,
)

ROWS = [
    (1, "john smith", "boston"),
    (2, "jon smith", "boston"),
    (3, "john smyth", "cambridge"),
    (4, "mary jones", "boston"),
    (5, "marie jones", "somerville"),
    (6, "robert brown", "boston"),
    (7, "roberto brown", "medford"),
    (8, "alice green", "boston"),
    (9, None, "boston"),
    (10, "alice greene", "quincy"),
    (11, "zed", "boston"),
    (12, "aaron hall", "malden"),
]


def brute_pairs(items, w):
    """items: (id, blocking_key_or_None); all pairs within w-1 positions
    under (blocking key, id) order, NULL keys excluded."""
    kept = sorted(((k, i) for i, k in items if k is not None))
    out = set()
    for a in range(len(kept)):
        for b in range(a + 1, min(a + w, len(kept))):
            i, j = kept[a][1], kept[b][1]
            out.add((min(i, j), max(i, j)))
    return out


def _df(spark):
    return spark.createDataFrame(ROWS, ["id", "name", "city"])


@pytest.mark.parametrize("w", [2, 3, 5])
def test_single_pass_matches_brute_force(spark, w):
    got = {
        (r["_l_key"], r["_r_key"])
        for r in sorted_neighborhood_pairs(_df(spark), "id", "name", w).collect()
    }
    exp = brute_pairs([(r[0], r[1]) for r in ROWS], w)
    assert got == exp
    # forward-only window: each unordered pair exactly once
    n = sorted_neighborhood_pairs(_df(spark), "id", "name", w).count()
    assert n == len(exp)


def test_null_blocking_keys_excluded(spark):
    pairs = sorted_neighborhood_pairs(_df(spark), "id", "name", 12).collect()
    assert all(9 not in (r["_l_key"], r["_r_key"]) for r in pairs)


def test_expression_blocking_key(spark):
    # sort by reversed name — a classic second SNM pass
    got = {
        (r["_l_key"], r["_r_key"])
        for r in sorted_neighborhood_pairs(
            _df(spark), "id", F.reverse(F.col("name")), 3
        ).collect()
    }
    exp = brute_pairs(
        [(r[0], r[1][::-1] if r[1] is not None else None) for r in ROWS], 3
    )
    assert got == exp


def test_multipass_union_distinct(spark):
    got = {
        (r["_l_key"], r["_r_key"])
        for r in multipass_sorted_neighborhood(
            _df(spark), "id", ["name", "city"], 3
        ).collect()
    }
    exp = brute_pairs([(r[0], r[1]) for r in ROWS], 3) | brute_pairs(
        [(r[0], r[2]) for r in ROWS], 3
    )
    assert got == exp
    assert (
        multipass_sorted_neighborhood(_df(spark), "id", ["name", "name"], 3).count()
        == len(brute_pairs([(r[0], r[1]) for r in ROWS], 3))
    )


def test_deterministic_under_input_partitioning(spark):
    a = sorted(
        (r["_l_key"], r["_r_key"])
        for r in sorted_neighborhood_pairs(_df(spark), "id", "name", 4).collect()
    )
    b = sorted(
        (r["_l_key"], r["_r_key"])
        for r in sorted_neighborhood_pairs(
            _df(spark).repartition(7), "id", "name", 4
        ).collect()
    )
    assert a == b


def test_global_positions_dense_and_ordered(spark):
    df = _df(spark).where(F.col("name").isNotNull())
    pos = global_sorted_positions(
        df.select("id", "name"), [F.col("name").asc(), F.col("id").asc()]
    ).collect()
    by_pos = sorted(pos, key=lambda r: r["_pos"])
    assert [r["_pos"] for r in by_pos] == list(range(len(by_pos)))
    assert [(r["name"], r["id"]) for r in by_pos] == sorted(
        (r["name"], r["id"]) for r in pos
    )


def test_window_size_validation(spark):
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(_df(spark), "id", "name", 1)
    with pytest.raises(ValueError):
        multipass_sorted_neighborhood(_df(spark), "id", [], 3)


L_ROWS = [(1, "john smith"), (2, "mary jones"), (3, "robert brown"), (4, None)]
R_ROWS = [(10, "jon smith"), (11, "marie jones"), (12, "zed"), (13, "aaron hall")]


def brute_two(l_items, r_items, w):
    merged = sorted(
        [(k, 0, i) for i, k in l_items if k is not None]
        + [(k, 1, i) for i, k in r_items if k is not None]
    )
    out = set()
    for a in range(len(merged)):
        for b in range(a + 1, min(a + w, len(merged))):
            if merged[a][1] != merged[b][1]:
                l = merged[a][2] if merged[a][1] == 0 else merged[b][2]
                r = merged[b][2] if merged[a][1] == 0 else merged[a][2]
                out.add((l, r))
    return out


@pytest.mark.parametrize("w", [2, 4, 8])
def test_two_table_matches_brute_force(spark, w):
    from py_stringsimjoin_spark.operators.sorted_neighborhood import (
        sorted_neighborhood_pairs_two_tables,
    )

    lt = spark.createDataFrame(L_ROWS, ["id", "name"])
    rt = spark.createDataFrame(R_ROWS, ["rid", "rname"])
    got = {
        (r["_l_key"], r["_r_key"])
        for r in sorted_neighborhood_pairs_two_tables(
            lt, rt, "id", "rid", "name", "rname", w
        ).collect()
    }
    assert got == brute_two(L_ROWS, R_ROWS, w)
    # cross-side only: no left-left or right-right ids on the wrong side
    assert all(l in {1, 2, 3} and r in {10, 11, 12, 13} for l, r in got)
