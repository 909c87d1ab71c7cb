"""pr_curve threshold sweep: brute-force mirror + edge semantics."""

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.evaluation import pr_curve

SCORED = [
    # (l, r, score) — includes a tie (0.8 twice), a duplicate pair with two
    # scores (max wins), and a reversed duplicate for the symmetric case
    ("a", "b", 0.9),
    ("a", "c", 0.8),
    ("b", "c", 0.8),
    ("a", "d", 0.5),
    ("c", "d", 0.3),
    ("a", "d", 0.2),   # duplicate pair, lower score — collapsed to 0.5
    ("d", "b", 0.4),
]
GOLD = [("a", "b"), ("b", "c"), ("b", "d")]  # (b,d) matches (d,b) only if symmetric


def _brute(symmetric):
    pairs = {}
    for l, r, s in SCORED:
        k = tuple(sorted((l, r))) if symmetric else (l, r)
        pairs[k] = max(pairs.get(k, -1), s)
    gold = {tuple(sorted(p)) if symmetric else p for p in GOLD}
    rows = {}
    for t in sorted({s for s in pairs.values()}, reverse=True):
        pred = {k for k, s in pairs.items() if s >= t}
        tp = len(pred & gold)
        p = tp / len(pred)
        r = tp / len(gold)
        f1 = 2 * p * r / (p + r) if p + r > 0 else None
        rows[t] = (len(pred), tp, p, r, f1)
    return rows


@pytest.fixture(scope="module")
def dfs(spark):
    scored = spark.createDataFrame(SCORED, "l string, r string, sim double")
    gold = spark.createDataFrame(GOLD, "gl string, gr string")
    return scored, gold


@pytest.mark.parametrize("symmetric", [False, True])
def test_matches_brute_force(dfs, symmetric):
    scored, gold = dfs
    out = pr_curve(scored, "l", "r", "sim", gold, "gl", "gr", symmetric=symmetric)
    got = {
        r.threshold: (r.predicted, r.tp, r.precision, r.recall, r.f1)
        for r in out.collect()
    }
    want = _brute(symmetric)
    assert set(got) == set(want)
    for t in want:
        gp, gt, gpr, gre, gf1 = got[t]
        wp, wt, wpr, wre, wf1 = want[t]
        assert (gp, gt) == (wp, wt), t
        assert gpr == pytest.approx(wpr) and gre == pytest.approx(wre)
        if wf1 is None:
            assert gf1 is None
        else:
            assert gf1 == pytest.approx(wf1)


def test_empty_gold_gives_null_recall(dfs, spark):
    scored, _ = dfs
    empty = spark.createDataFrame([], "gl string, gr string")
    out = pr_curve(scored, "l", "r", "sim", empty, "gl", "gr").collect()
    assert len(out) > 0
    assert all(r.recall is None and r.tp == 0 and r.f1 is None for r in out)


def test_round_to_quantizes(dfs, spark):
    scored = spark.createDataFrame(
        [("a", "b", 0.812), ("a", "c", 0.814), ("b", "c", 0.3)],
        "l string, r string, sim double",
    )
    gold = spark.createDataFrame([("a", "b")], "gl string, gr string")
    out = pr_curve(scored, "l", "r", "sim", gold, "gl", "gr", round_to=2)
    ts = sorted(r.threshold for r in out.collect())
    assert ts == [0.3, 0.81]


def test_plan_is_python_free(dfs):
    scored, gold = dfs
    out = pr_curve(scored, "l", "r", "sim", gold, "gl", "gr")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
