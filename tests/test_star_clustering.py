"""star_clustering vs an independent brute-force oracle on random graphs."""

from __future__ import annotations

import random

from pyspark.sql import Row

from py_stringsimjoin_spark.operators.star_clustering import star_clustering


def brute_star(edges):
    """Independent re-derivation of the deterministic star definition:
    dominance order (degree DESC, id ASC), center iff undominated,
    attach to dominant adjacent center, orphan -> singleton."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}

    def rank(v):  # smaller = more dominant
        return (-deg[v], v)

    centers = {v for v, ns in adj.items()
               if all(rank(v) < rank(u) for u in ns)}
    out = {}
    for v, ns in adj.items():
        if v in centers:
            out[v] = v
        else:
            adj_centers = [u for u in ns if u in centers]
            out[v] = min(adj_centers, key=rank) if adj_centers else v
    return out


def _run(spark, edges):
    df = spark.createDataFrame([Row(l=a, r=b) for a, b in edges])
    got = star_clustering(df, "l", "r").collect()
    return {r["node"]: r["cluster"] for r in got}


def test_path_chain_breaks_but_triangle_holds(spark):
    # path 1-2-3-4: degree ties break by id -> 2 is the center, 3 is
    # dominated by 2; 4's only neighbor (3) is not a center -> singleton.
    # transitive CC would merge all four; star must NOT.
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _run(spark, edges)
    assert got == brute_star(edges)
    assert len(set(got.values())) > 1
    # a triangle is one star
    tri = [(10, 11), (11, 12), (10, 12)]
    got = _run(spark, tri)
    assert got == brute_star(tri) and len(set(got.values())) == 1


def test_hub_star(spark):
    edges = [(100, i) for i in range(1, 9)]
    got = _run(spark, edges)
    assert got == brute_star(edges)
    assert all(c == 100 for c in got.values())


def test_random_graphs_match_bruteforce(spark):
    rng = random.Random(7)
    for trial in range(6):
        n = rng.randrange(8, 40)
        m = rng.randrange(n, 3 * n)
        edges = list({(rng.randrange(n), rng.randrange(n))
                      for _ in range(m)})
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        # duplicates + both orientations must not change the result
        noisy = edges + [(b, a) for a, b in edges[::2]] + edges[:3]
        got = _run(spark, noisy)
        want = brute_star(edges)
        assert got == want, (trial, sorted(edges))


def test_output_is_partition_with_center_ids(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    nodes = {v for e in edges for v in e}
    assert set(got) == nodes                     # one row per node
    for node, cluster in got.items():
        if cluster != node:                      # attached -> to a CENTER
            assert got[cluster] == cluster
