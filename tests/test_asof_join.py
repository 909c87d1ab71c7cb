"""asof_join vs a brute-force per-row scan (pandas.merge_asof semantics:
inclusive nearest, tolerance nullifies rather than reaches past, right ties
on the ordering value resolve to the largest right key)."""

import random

import pytest

from py_stringsimjoin_spark.operators.asof_join import asof_join


def _truth(l_rows, r_rows, direction, tol, with_by):
    out = {}
    for lk, lon, lby in l_rows:
        best = None
        if lon is not None:
            for rk, ron, rby, rv in r_rows:
                if ron is None or (with_by and (rby is None or rby != lby)):
                    continue
                gap = lon - ron if direction == "backward" else ron - lon
                if gap < 0:
                    continue
                # nearest on, then max key
                cand = (-gap, rk)
                if best is None or cand > best[0]:
                    best = (cand, (rk, ron, rv, gap))
        if best is not None and tol is not None and best[1][3] > tol:
            best = None
        out[(lk, lon, lby)] = best[1][:3] if best else (None, None, None)
    return out


def _data(rng, n_l=40, n_r=60):
    l_rows = [(i, rng.choice([None] + list(range(0, 1000, 7))), rng.randint(0, 4))
              for i in range(n_l)]
    r_rows = [(100 + i, rng.choice([None] + list(range(0, 1000, 5))),
               rng.choice([None, 0, 1, 2, 3, 4]), float(i)) for i in range(n_r)]
    # force ordering-value ties inside one group
    r_rows += [(900, 250, 2, 9.0), (901, 250, 2, 8.0)]
    return l_rows, r_rows


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tol", [None, 50])
def test_vs_brute_force(spark, direction, tol):
    rng = random.Random(7)
    l_rows, r_rows = _data(rng)
    ldf = spark.createDataFrame(l_rows, "lk long, lon long, grp long")
    rdf = spark.createDataFrame(r_rows, "rk long, ron long, grp long, val double")
    got = asof_join(
        ldf, rdf, "lk", "rk", "lon", "ron", "grp", "grp",
        direction=direction, tolerance=tol, r_value_attrs=["val"],
    ).collect()
    truth = _truth(l_rows, r_rows, direction, tol, with_by=True)
    assert len(got) == len(l_rows)
    for row in got:
        want = truth[(row.l_lk, row.l_lon, row.grp)]
        assert (row.r_rk, row.r_ron, row.r_val) == want, (row, want)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_no_by_global(spark, direction):
    rng = random.Random(13)
    l_rows, r_rows = _data(rng, n_l=15, n_r=20)
    ldf = spark.createDataFrame(l_rows, "lk long, lon long, grp long")
    rdf = spark.createDataFrame(r_rows, "rk long, ron long, grp long, val double")
    got = asof_join(
        ldf, rdf, "lk", "rk", "lon", "ron", direction=direction,
        r_value_attrs=["val"],
    ).collect()
    truth = _truth(l_rows, r_rows, direction, None, with_by=False)
    # keys unique → compare on key alone
    tk = {lk: v for (lk, _, _), v in truth.items()}
    assert len(got) == len(l_rows)
    for row in got:
        assert (row.r_rk, row.r_ron, row.r_val) == tk[row.l_lk]


def test_validation(spark):
    ldf = spark.createDataFrame([(1, 2, 3)], "lk long, lon long, grp long")
    rdf = spark.createDataFrame([(1, 2, 3)], "rk long, ron long, grp long")
    with pytest.raises(AssertionError):
        asof_join(ldf, rdf, "lk", "rk", "lon", "ron", direction="nearest")
    with pytest.raises(AssertionError):
        asof_join(ldf, rdf, "lk", "rk", "lon", "ron", tolerance=-1)
    with pytest.raises(AssertionError):
        asof_join(ldf, rdf, "lk", "rk", "lon", "ron", l_by_attr="grp")
    with pytest.raises(AssertionError):
        asof_join(ldf, rdf, "lk", "rk", "lon", "nope")
