"""Top-k set-sim join vs a brute-force per-record top-k oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark import WhitespaceTokenizer, topk_sim_join
from py_stringsimjoin_spark.operators.topk_join import topk_set_sim_join_pairs

from .oracle import sim_on_sets

WS = WhitespaceTokenizer(return_set=True)


def _brute_topk(rows, key_i, attr_i, k, floor, measure="jaccard"):
    """{(l_key, r_key): (score, rank)} — both directions, self excluded,
    ties broken by ascending r_key (the operator's documented rule)."""
    toks = {
        r[key_i]: WS.tokenize(r[attr_i]) for r in rows if r[attr_i] is not None
    }
    out = {}
    for lk, lt in toks.items():
        scored = []
        for rk, rt in toks.items():
            if rk == lk:
                continue
            if len(lt) == 0 or len(rt) == 0:
                continue  # allow_empty=False in the top-k plan
            s = sim_on_sets(measure, lt, rt)
            if s >= floor:
                scored.append((rk, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for rank, (rk, s) in enumerate(scored[:k], 1):
            out[(lk, rk)] = (s, rank)
    return out


ROWS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta delta"),
    (3, "alpha beta gamma delta"),
    (4, "alpha beta"),
    (5, "gamma delta epsilon"),
    (6, "zeta eta theta"),
    (7, "zeta eta theta"),  # exact dup of 6
    (8, ""),                # empty token set — excluded
    (9, None),              # NULL — excluded
    (10, "alpha gamma epsilon zeta"),
]


@pytest.mark.parametrize("k,floor,measure", [
    (1, 0.3, "jaccard"),
    (2, 0.3, "jaccard"),
    (3, 0.2, "cosine"),
    (10, 0.5, "dice"),
])
def test_topk_pairs_match_brute_force(spark, k, floor, measure):
    df = spark.createDataFrame(ROWS, ["id", "name"])
    got = {
        (r["_l_key"], r["_r_key"]): (r["_sim_score"], r["_rank"])
        for r in topk_set_sim_join_pairs(
            measure, df, df, "id", "id", "name", "name", WS, k, floor
        ).collect()
    }
    want = _brute_topk(ROWS, 0, 1, k, floor, measure)
    assert set(got) == set(want)
    for pair, (score, rank) in want.items():
        assert got[pair][0] == pytest.approx(score, abs=1e-12)
        assert got[pair][1] == rank


def test_topk_public_surface(spark):
    df = spark.createDataFrame(ROWS, ["id", "name"])
    out = topk_sim_join(
        df, df, "id", "id", "name", "name", WS, 2, 0.3,
        l_out_attrs=["name"], r_out_attrs=["name"],
    )
    cols = out.columns
    assert "l_id" in cols and "r_id" in cols and "rank" in cols
    assert "l_name" in cols and "r_name" in cols and "_sim_score" in cols
    # every left key appears at most k times and ranks are 1..n consecutive
    per_l = (
        out.groupBy("l_id")
        .agg(F.count("*").alias("n"), F.collect_list("rank").alias("ranks"))
        .collect()
    )
    for row in per_l:
        assert row["n"] <= 2
        assert sorted(row["ranks"]) == list(range(1, row["n"] + 1))


def test_topk_edit_distance_matches_brute_force(spark):
    from py_stringsimjoin_spark import topk_edit_distance_join
    from .oracle import levenshtein

    rows = [
        (1, "martha"),
        (2, "marhta"),
        (3, "martin"),
        (4, "marta"),
        (5, "jones"),
        (6, "johnes"),
        (7, "jones"),
        (8, None),
    ]
    k, ceiling = 2, 2
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r["l_id"], r["r_id"]): (r["_sim_score"], r["rank"])
        for r in topk_edit_distance_join(
            df, df, "id", "id", "name", "name", k, ceiling
        ).collect()
    }
    names = {i: n for i, n in rows if n is not None}
    want = {}
    for li, ln in names.items():
        scored = sorted(
            (
                (levenshtein(ln, rn), ri)
                for ri, rn in names.items()
                if ri != li and levenshtein(ln, rn) <= ceiling
            ),
        )
        for rank, (d, ri) in enumerate(scored[:k], 1):
            want[(li, ri)] = (float(d), rank)
    assert got == want


def test_topk_rejects_bad_k(spark):
    df = spark.createDataFrame(ROWS, ["id", "name"])
    with pytest.raises(ValueError):
        topk_sim_join(df, df, "id", "id", "name", "name", WS, 0, 0.3)
