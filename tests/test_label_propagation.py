"""label_propagation vs a direct python mirror of the synchronous rule."""

import pytest

from py_stringsimjoin_spark.operators.label_propagation import (
    label_propagation,
    lpa_oracle_stages,
)


def _mirror(pairs, num_iters):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(num_iters):
        nxt = {}
        for v, ns in adj.items():
            counts = {}
            for u in ns:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            mc = max(counts.values())
            nxt[v] = min(l for l, c in counts.items() if c == mc)
        labels = nxt
    return labels


PAIRS = (
    # two dense triangles bridged by one weak edge + a chain + a dup edge
    [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    + [(20, 21), (21, 22), (22, 23)]
    + [(1, 2), (2, 1), (5, 5)]
)


@pytest.mark.parametrize("iters", [1, 3, 5])
def test_matches_mirror(spark, iters):
    df = spark.createDataFrame(PAIRS, ["l", "r"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, "l", "r", num_iters=iters).collect()
    }
    assert got == _mirror(PAIRS, iters)


def test_dense_cores_separate_from_chain(spark):
    df = spark.createDataFrame(PAIRS, ["l", "r"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, "l", "r", num_iters=5).collect()
    }
    # each triangle converges to one label; the chain stays apart
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[20] not in (got[1], got[10])


def test_oracle_stage_sql_matches(spark):
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(PAIRS, ["l", "r"])
    got = (
        label_propagation(df, "l", "r", num_iters=4)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", pd.DataFrame(PAIRS, columns=["l", "r"]))
    sql = (
        "WITH e AS (SELECT l AS src, r AS dst FROM p WHERE l <> r "
        "UNION SELECT r, l FROM p WHERE l <> r),\n"
        + lpa_oracle_stages("e", 4)
    )
    odf = con.execute(sql).df().sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == odf["node"].tolist()
    assert got["label"].tolist() == odf["label"].tolist()


def test_validation(spark):
    df = spark.createDataFrame(PAIRS, ["l", "r"])
    with pytest.raises(AssertionError):
        label_propagation(df, "l", "r", num_iters=0)
