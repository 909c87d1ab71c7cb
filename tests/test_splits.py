"""Deterministic split assignment: python/Spark/DuckDB agreement + semantics."""

import hashlib

import duckdb
import pytest

from py_stringsimjoin_spark.operators.splits import (
    assign_splits,
    split_bounds_sql,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SEED = "exp1"


def _py_split(key, weights=WEIGHTS, seed=SEED):
    if key is None:
        return None
    h = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8]
    total = sum(weights.values())
    names = list(weights)
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        if h < format(min(int(acc * (1 << 32)), (1 << 32) - 1), "08x"):
            return name
    return names[-1]


@pytest.fixture(scope="module")
def assigned(spark):
    rows = [(i,) for i in range(2000)] + [(None,)]
    df = spark.createDataFrame(rows, "id int")
    out = assign_splits(df, "id", WEIGHTS, seed=SEED)
    return {r.id: r.split for r in out.collect()}


def test_matches_python_and_duckdb(assigned):
    con = duckdb.connect()
    case = split_bounds_sql("id", WEIGHTS, seed=SEED)
    duck = dict(
        con.execute(
            f"SELECT id, {case} FROM (SELECT unnest(range(2000)) AS id)"
        ).fetchall()
    )
    for i in range(2000):
        assert assigned[i] == _py_split(i) == duck[i], i
    assert assigned[None] is None


def test_proportions_and_stability(assigned, spark):
    from collections import Counter

    c = Counter(v for k, v in assigned.items() if k is not None)
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.06 < c["val"] / 2000 < 0.14
    assert 0.06 < c["test"] / 2000 < 0.14
    # adding rows never moves existing keys
    df2 = spark.createDataFrame([(i,) for i in range(4000)], "id int")
    again = {
        r.id: r.split
        for r in assign_splits(df2, "id", WEIGHTS, seed=SEED).collect()
    }
    assert all(again[i] == assigned[i] for i in range(2000))
    # a different seed re-deals
    other = {
        r.id: r.split
        for r in assign_splits(df2, "id", WEIGHTS, seed="other").collect()
    }
    assert any(other[i] != assigned[i] for i in range(2000))


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id int, split string")
    with pytest.raises(AssertionError):
        assign_splits(df, "id")  # out_col collision
    with pytest.raises(AssertionError):
        assign_splits(df.drop("split"), "id", weights={})
    with pytest.raises(AssertionError):
        assign_splits(df.drop("split"), "id", weights={"a": -1, "b": 2})


def test_plan_map_only(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    out = assign_splits(df, "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
