"""Numeric band join vs brute force + plan shape."""

import random

from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.band_join import band_join


def _brute(rows_l, rows_r, eps, dedup):
    out = set()
    for i, a in rows_l:
        for j, b in rows_r:
            if a is None or b is None:
                continue
            if abs(a - b) <= eps and (not dedup or i < j):
                out.add((i, j))
    return out


def test_band_join_matches_brute_force(spark):
    rng = random.Random(99)
    rows = [(i, round(rng.uniform(-5, 5), 3)) for i in range(300)]
    rows += [(300, None), (301, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    for eps in (0.05, 0.5):
        got = {
            (r.l_id, r.r_id)
            for r in band_join(df, df, "id", "id", "v", "v", eps,
                               self_join_dedup=True).collect()
        }
        assert got == _brute(rows, rows, eps, dedup=True), eps


def test_band_join_two_tables_and_columns(spark):
    l = spark.createDataFrame([(1, 10.0), (2, -3.0)], "id long, v double")
    r = spark.createDataFrame([(7, 10.4), (8, -2.9), (9, 50.0)], "id long, v double")
    out = band_join(l, r, "id", "id", "v", "v", 0.5).collect()
    got = {(x.l_id, x.r_id): x for x in out}
    assert set(got) == {(1, 7), (2, 8)}
    row = got[(1, 7)]
    assert row.l_v == 10.0 and row.r_v == 10.4
    assert abs(row.abs_diff - 0.4) < 1e-12


def test_band_join_no_duplicate_pairs_across_buckets(spark):
    # values straddling a bucket boundary must appear exactly once
    l = spark.createDataFrame([(1, 0.999), (2, 1.001)], "id long, v double")
    out = band_join(l, l, "id", "id", "v", "v", 1.0, self_join_dedup=True)
    rows = out.collect()
    assert len(rows) == 1 and (rows[0].l_id, rows[0].r_id) == (1, 2)


def test_band_join_plan_is_python_free(spark):
    from tests.test_plan_properties import _PY_NODES, _plan

    df = spark.range(10).select(F.col("id"), (F.col("id") * 1.5).alias("v"))
    plan = _plan(band_join(df, df, "id", "id", "v", "v", 0.25))
    for node in _PY_NODES:
        assert node not in plan
