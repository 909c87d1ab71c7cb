"""SemDeDup: brute-force python mirror + pandas-vs-expr path parity.

The mirror recomputes the paper rule directly: assign each vector to its
nearest centroid (cosine, ties -> lower cell), rank cell members by the
chosen order, drop an item iff ANY earlier-ranked cell-mate has cosine >=
threshold (rank-based, not greedy — a dropped item still shadows later
ones, per Abbas et al. 2023).
"""

import numpy as np
import pytest

from py_stringsimjoin_spark.operators.semdedup import semdedup


@pytest.fixture(scope="module")
def corpus(spark):
    """70 vectors (dim 6): 4 loose clusters, plus planted near-duplicate
    groups (scaled copies — identical direction => cosine 1.0) and one
    exact duplicate pair, so every branch of the rule fires."""
    rng = np.random.RandomState(11)
    centers = rng.randn(4, 6) * 3
    X = np.vstack([centers[i % 4] + 0.5 * rng.randn(6) for i in range(60)])
    dups = [X[3] * 1.7, X[3] * 0.4, X[10] * 2.0, X[21], X[21] * 1.1, X[44] * 0.9,
            X[7] * 3.0, X[7] * 0.2, X[30] * 1.3, X[55] * 1.01]
    X = np.vstack([X, np.array(dups)])
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), X


def _mirror(X, C, threshold, order_by):
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    S = Xn @ Cn.T
    # nearest centroid, ties -> lower cell id (argmax returns first max)
    cells = np.argmax(S, axis=1)
    keep = {}
    for c in set(cells.tolist()):
        idx = np.where(cells == c)[0]
        # same matrix-vector shape as the operator's per-cell kernel, so
        # BLAS rounding of near-tied csim values matches bit-for-bit
        csim = Xn[idx] @ Cn[c]
        if order_by == "centroid":
            order = idx[np.lexsort((idx, csim))]
        else:
            order = np.sort(idx)
        for p, i in enumerate(order):
            earlier = order[:p]
            keep[i] = not np.any(Xn[earlier] @ Xn[i] >= threshold)
    return cells, keep


@pytest.mark.parametrize("order_by", ["centroid", "id"])
@pytest.mark.parametrize("threshold", [0.999, 0.9])
def test_pandas_matches_mirror(spark, corpus, order_by, threshold):
    df, X = corpus
    rng = np.random.RandomState(3)
    C = X[rng.choice(len(X), 5, replace=False)].astype(np.float64)
    got = {
        r["id"]: (r["cell"], r["keep"])
        for r in semdedup(
            df, threshold=threshold, centroids=C, method="pandas",
            order_by=order_by,
        ).collect()
    }
    cells, keep = _mirror(X, C, threshold, order_by)
    assert set(got) == set(range(len(X)))
    for i in range(len(X)):
        assert got[i][0] == cells[i], f"cell mismatch at {i}"
        assert got[i][1] == keep[i], f"keep mismatch at {i}"
    # the planted duplicate groups must have lost members
    assert sum(1 for _, k in got.values() if not k) >= 5


def test_expr_matches_pandas(spark, corpus):
    """Both physical paths agree on (cell, keep). Ranked by id: the keep
    decision then hinges only on threshold comparisons (robustly far from
    the boundary on this fixture), not on ulp-level csim tie order between
    the sequential-fold expressions and BLAS — exactly-colinear planted
    copies make the centroid-rank of tied members ulp-noise by design."""
    df, X = corpus
    rng = np.random.RandomState(5)
    C = X[rng.choice(len(X), 4, replace=False)].astype(np.float64)
    a = {
        r["id"]: (r["cell"], r["keep"])
        for r in semdedup(
            df, threshold=0.98, centroids=C, method="expr", order_by="id"
        ).collect()
    }
    b = {
        r["id"]: (r["cell"], r["keep"])
        for r in semdedup(
            df, threshold=0.98, centroids=C, method="pandas", order_by="id"
        ).collect()
    }
    assert a == b


def test_threshold_one_keeps_only_exact_shadowed(spark, corpus):
    df, X = corpus
    C = X[:3].astype(np.float64)
    out = semdedup(df, threshold=1.0, centroids=C, method="pandas")
    dropped = [r["id"] for r in out.collect() if not r["keep"]]
    # colinear planted copies have cosine exactly 1.0 only up to fp;
    # at threshold=1.0 drops are possible but never of non-colinear rows
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for d in dropped:
        assert np.any((Xn @ Xn[d]) >= 1.0 - 1e-12)


def test_validation(spark, corpus):
    df, _ = corpus
    with pytest.raises(AssertionError):
        semdedup(df, threshold=0.0)
    with pytest.raises(AssertionError):
        semdedup(df, threshold=0.5, order_by="nope")
    with pytest.raises(AssertionError):
        semdedup(df, threshold=0.5, method="nope")
