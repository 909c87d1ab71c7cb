"""merge_center_clustering vs an independent brute-force mirror (star
definition re-derived + bridge relation + union-find, no shared code)."""

from __future__ import annotations

import random

from pyspark.sql import Row

from py_stringsimjoin_spark.operators.star_clustering import (
    merge_center_clustering,
)
from tests.test_star_clustering import brute_star


def brute_merge_center(edges):
    star = brute_star(edges)
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    centers = {c for c in star.values()}
    # adjacent-or-equal center sets per node
    parent = {c: c for c in centers}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u in set(adj) | centers:
        cs = {c for c in centers if c == u or c in adj.get(u, ())}
        cs = sorted(cs)
        for c in cs[1:]:
            union(cs[0], c)
    # exact min-id component per merged group
    groups = {}
    for c in centers:
        groups.setdefault(find(c), []).append(c)
    rep = {c: min(g) for _, g in groups.items() for c in g}
    return {v: rep[c] for v, c in star.items()}


def _run(spark, edges):
    df = spark.createDataFrame([Row(l=a, r=b) for a, b in edges])
    got = merge_center_clustering(df, "l", "r").collect()
    return {r["node"]: r["cluster"] for r in got}


def test_dumbbell_merges_but_chain_still_breaks(spark):
    # two hubs sharing a bridge node: star splits them, merge-center joins
    hubs = [(1, i) for i in range(10, 14)] + [(2, i) for i in range(20, 24)]
    bridge = [(1, 5), (2, 5)]
    edges = hubs + bridge
    got = _run(spark, edges)
    want = brute_merge_center(edges)
    assert got == want
    assert len(set(got.values())) == 1  # single merged cluster

    # a long path: star breaks it; adjacent centers bridge through shared
    # neighbors, but far ends stay separate when no bridge exists
    path = [(i, i + 1) for i in range(30, 40)]
    got = _run(spark, path)
    assert got == brute_merge_center(path)


def test_random_graphs_match_bruteforce(spark):
    rng = random.Random(23)
    for trial in range(6):
        n = rng.randrange(8, 36)
        m = rng.randrange(n, 3 * n)
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        noisy = edges + [(b, a) for a, b in edges[::2]] + edges[:2]
        got = _run(spark, noisy)
        want = brute_merge_center(edges)
        assert got == want, (trial, sorted(edges))


def test_refines_cc_and_coarsens_star(spark):
    # merge-center partitions sit between star (finer) and CC (coarser)
    from py_stringsimjoin_spark.operators.connected_components import (
        connected_components,
    )
    from py_stringsimjoin_spark.operators.star_clustering import star_clustering

    rng = random.Random(4)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(50)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame([Row(l=a, r=b) for a, b in edges])
    mc = {r["node"]: r["cluster"] for r in
          merge_center_clustering(df, "l", "r").collect()}
    st = {r["node"]: r["cluster"] for r in
          star_clustering(df, "l", "r").collect()}
    cc = {r["node"]: r["component"] for r in
          connected_components(df, "l", "r").collect()}
    for a in mc:
        for b in mc:
            if st[a] == st[b]:
                assert mc[a] == mc[b]      # star-mates never split
            if mc[a] == mc[b]:
                assert cc[a] == cc[b]      # merged-mates share a component
