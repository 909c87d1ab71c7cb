"""IVF ANN: brute-force oracles + numpy-vs-expr assignment parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.ann import brute_force_topk
from py_stringsimjoin_spark.operators.ivf import (
    assign_cells,
    ivf_topk,
    kmeans_centroids,
    sample_centroids,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """60 vectors in 4 well-separated Gaussian clusters (dim 8)."""
    rng = np.random.RandomState(7)
    centers = rng.randn(4, 8) * 4
    X = np.vstack([centers[i % 4] + 0.3 * rng.randn(8) for i in range(60)])
    rows = [(i, [float(x) for x in X[i]]) for i in range(60)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), X


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_full_probe_equals_bruteforce(spark, clustered):
    df, _ = clustered
    queries = df.where(F.col("vec_id") < 4)
    exact = _pairs(brute_force_topk(df, queries, k=5))
    got = _pairs(
        ivf_topk(df, queries, k=5, num_cells=6, nprobe=6, centroids="sample")
    )
    assert got == exact


def test_expr_matches_numpy_assignment(spark, clustered):
    df, _ = clustered
    C = sample_centroids(df, "vec_id", "embedding", 5)
    for nprobe in (1, 3):
        a = {
            (r["id"], r["cell"])
            for r in assign_cells(
                df, "vec_id", "embedding", C, nprobe=nprobe, method="numpy"
            ).collect()
        }
        b = {
            (r["id"], r["cell"])
            for r in assign_cells(
                df, "vec_id", "embedding", C, nprobe=nprobe, method="expr"
            ).collect()
        }
        assert a == b, nprobe


def test_kmeans_recall_on_clustered_data(spark, clustered):
    df, X = clustered
    queries = df.where(F.col("vec_id") < 8)
    exact = brute_force_topk(df, queries, k=5)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = ivf_topk(
        df, queries, k=5, num_cells=4, nprobe=1, centroids="kmeans",
        max_train_rows=60,
    )
    got_sets = {}
    for r in got.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got_sets.get(q, set()) & s) for q, s in exact_sets.items())
    total = sum(len(s) for s in exact_sets.values())
    # 4 trained cells over 4 true clusters, nprobe=1: same-cluster
    # neighbors dominate every top-5 list
    assert hits / total >= 0.8, (hits, total)
    # every returned cosine is the exact cosine (rerank is exact)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    for r in got.collect():
        assert r["cosine"] == pytest.approx(S[r["query_id"], r["neighbor_id"]])


def test_sample_centroids_deterministic_and_md5_ordered(spark, clustered):
    import duckdb

    df, X = clustered
    C1 = sample_centroids(df, "vec_id", "embedding", 6)
    C2 = sample_centroids(df, "vec_id", "embedding", 6)
    assert np.array_equal(C1, C2)
    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.execute(
            "SELECT i FROM (SELECT unnest(range(60)) AS i) "
            "ORDER BY md5(CAST(i AS VARCHAR)) LIMIT 6"
        ).fetchall()
    ]
    exp = np.array([X[i] for i in ids])
    assert np.allclose(C1, exp, atol=1e-6)  # float32 storage round-trip


def test_kmeans_centroids_deterministic(spark, clustered):
    df, _ = clustered
    C1 = kmeans_centroids(df, "vec_id", "embedding", 4, max_train_rows=60)
    C2 = kmeans_centroids(df, "vec_id", "embedding", 4, max_train_rows=60)
    assert np.array_equal(C1, C2)
    assert C1.shape == (4, 8)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)
