"""Incremental connected-components update vs full recompute."""

import random

from py_stringsimjoin_spark.operators.connected_components import (
    connected_components,
    update_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.component
        for r in connected_components(df, "src", "dst").collect()
    }


def test_update_merges_new_and_old(spark):
    base = [(1, 2), (2, 3), (10, 11)]
    assign = spark.createDataFrame(
        sorted(_cc(spark, base).items()), "node long, component long"
    )
    # delta: merge comp 1 with comp 10; brand-new cluster {20,21};
    # fresh node 50 attaching to an existing comp
    delta = spark.createDataFrame(
        [(3, 10), (20, 21), (11, 50)], "src long, dst long"
    )
    got = {
        r.node: r.component
        for r in update_components(assign, delta).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 50: 1, 20: 20, 21: 20}


def test_fresh_node_becomes_new_min(spark):
    assign = spark.createDataFrame([(1, 1), (2, 1)], "node long, component long")
    delta = spark.createDataFrame([(2, 0)], "src long, dst long")
    got = {r.node: r.component for r in update_components(assign, delta).collect()}
    assert got == {0: 0, 1: 0, 2: 0}


def test_empty_delta_is_identity(spark):
    assign = spark.createDataFrame([(1, 1), (2, 1)], "node long, component long")
    delta = spark.createDataFrame([], "src long, dst long")
    got = {r.node: r.component for r in update_components(assign, delta).collect()}
    assert got == {1: 1, 2: 1}


def test_incremental_equals_full_recompute_randomized(spark):
    rng = random.Random(20260818)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    cut = len(edges) * 2 // 3
    base, delta = edges[:cut], edges[cut:]
    assign = spark.createDataFrame(
        sorted(_cc(spark, base).items()), "node long, component long"
    )
    got = {
        r.node: r.component
        for r in update_components(
            assign, spark.createDataFrame(delta, "src long, dst long")
        ).collect()
    }
    want = _cc(spark, base + delta)
    # full CC covers only nodes present in edges; incremental covers the
    # same set (assignment nodes ∪ delta endpoints)
    assert got == want
