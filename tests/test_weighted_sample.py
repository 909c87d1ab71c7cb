"""weighted_sample vs a direct python mirror + a statistical sanity check."""

import hashlib

import pytest

from py_stringsimjoin_spark.operators.weighted_sample import weighted_sample

ROWS = [(0, 10), (1, 1), (2, 5), (3, 0), (4, None), (5, 3), (6, 100), (7, 1)]


def _mirror(rows, k, seed, max_weight=10**6):
    keys = {}
    for i, w in rows:
        if w is None or w <= 0:
            continue
        w = min(w, max_weight)
        d = min(
            hashlib.md5(f"{seed}|{i}|{r}".encode()).hexdigest()
            for r in range(1, w + 1)
        )
        keys[i] = (d, w)
    order = sorted(keys.items(), key=lambda kv: (kv[1][0], kv[0]))[:k]
    return {i: (w, rank) for rank, (i, (d, w)) in enumerate(order, 1)}


@pytest.mark.parametrize("k,seed", [(3, 42), (8, 7), (1, 0)])
def test_matches_mirror(spark, k, seed):
    df = spark.createDataFrame(ROWS, ["doc_id", "wt"])
    got = {
        r["id"]: (r["weight"], r["draw_rank"])
        for r in weighted_sample(df, "doc_id", "wt", k=k, seed=seed).collect()
    }
    assert got == _mirror(ROWS, k, seed)


def test_max_weight_cap(spark):
    df = spark.createDataFrame([(0, 50), (1, 2)], ["doc_id", "wt"])
    got = {
        r["id"]: (r["weight"], r["draw_rank"])
        for r in weighted_sample(df, "doc_id", "wt", k=2, seed=3, max_weight=5).collect()
    }
    exp = _mirror([(0, 50), (1, 2)], 2, 3, max_weight=5)
    assert got == exp
    assert got[0][0] == 5  # clipped


def test_weight_bias(spark):
    """Across seeds, the heavy item should win rank 1 far more often."""
    rows = [(0, 50), (1, 1), (2, 1)]
    df = spark.createDataFrame(rows, ["doc_id", "wt"])
    wins = 0
    for seed in range(20):
        top = weighted_sample(df, "doc_id", "wt", k=1, seed=seed).first()
        wins += top["id"] == 0
    assert wins >= 15  # E[wins] = 20 * 50/52 ≈ 19.2


def test_validation(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "wt"])
    with pytest.raises(AssertionError):
        weighted_sample(df, "doc_id", "wt", k=0)
