"""domain_quotas / domain_mix_sample vs a direct python mirror."""

import hashlib
import math
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.mixing import domain_mix_sample, domain_quotas

ROWS = (
    [(i, "en") for i in range(40)]
    + [(100 + i, "fr") for i in range(10)]
    + [(200 + i, "zh") for i in range(4)]
    + [(300 + i, "de") for i in range(1)]
    + [(400, None)]
)


def _mirror_quotas(rows, n_target, alpha):
    counts = Counter(d for _, d in rows if d is not None)
    w = {d: math.sqrt(float(c)) if alpha == 0.5 else float(c) ** alpha
         for d, c in counts.items()}
    W = sum(w.values())  # float sum order differs from Spark; values far from ties here
    share = {d: (float(n_target) * w[d]) / W for d in w}
    base = {d: math.floor(share[d]) for d in w}
    rem = {d: share[d] - base[d] for d in w}
    leftover = n_target - sum(base.values())
    order = sorted(w, key=lambda d: (-rem[d], d))
    quota = dict(base)
    for d in order[: max(0, leftover)]:
        quota[d] += 1
    return {d: (counts[d], min(quota[d], counts[d])) for d in w}


@pytest.mark.parametrize("n_target,alpha", [(20, 0.5), (55, 0.5), (0, 0.5), (30, 1.0)])
def test_quotas_match_mirror(spark, n_target, alpha):
    df = spark.createDataFrame(ROWS, ["doc_id", "lang"])
    got = {
        r["domain"]: (r["n_docs"], r["quota"])
        for r in domain_quotas(df, "lang", n_target, alpha).collect()
    }
    assert got == _mirror_quotas(ROWS, n_target, alpha)
    # quota mass: == n_target unless capped domains bind
    assert sum(q for _, q in got.values()) <= max(n_target, 0) + len(got)


def test_sample_is_md5_prefix(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "lang"])
    out = domain_mix_sample(df, "doc_id", "lang", 20, alpha=0.5, seed=7).collect()
    quotas = _mirror_quotas(ROWS, 20, 0.5)
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r["id"])
    for d, (n, q) in quotas.items():
        ids = [i for i, dd in ROWS if dd == d]
        ids.sort(key=lambda i: (hashlib.md5(f"7|{i}".encode()).hexdigest(), i))
        assert sorted(by_dom.get(d, [])) == sorted(ids[:q]), d
    # alpha=0.5 up-weights small domains vs natural proportions
    assert len(by_dom.get("fr", [])) >= 3


def test_sample_stable_under_growth(spark):
    """Adding rows to OTHER domains never changes which ids an unchanged
    domain would pick at the same quota (md5 order is per-domain local)."""
    df1 = spark.createDataFrame(ROWS, ["doc_id", "lang"])
    grown = ROWS + [(500 + i, "en") for i in range(20)]
    df2 = spark.createDataFrame(grown, ["doc_id", "lang"])
    pick1 = {
        (r["domain"], r["id"])
        for r in domain_mix_sample(df1, "doc_id", "lang", 20, seed=7).collect()
        if r["domain"] == "zh"
    }
    pick2 = {
        (r["domain"], r["id"])
        for r in domain_mix_sample(df2, "doc_id", "lang", 20, seed=7).collect()
        if r["domain"] == "zh"
    }
    q1 = _mirror_quotas(ROWS, 20, 0.5)["zh"][1]
    q2 = _mirror_quotas(grown, 20, 0.5)["zh"][1]
    if q1 == q2:
        assert pick1 == pick2
    else:
        small, big = (pick1, pick2) if q1 < q2 else (pick2, pick1)
        assert small <= big


def test_validation(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "lang"])
    with pytest.raises(AssertionError):
        domain_quotas(df, "lang", -1)
    with pytest.raises(AssertionError):
        domain_quotas(df, "lang", 10, alpha=-0.1)
