"""featurize_pairs: one-pass multi-measure feature table for ML matching."""

import numpy as np
import pytest

from py_stringsimjoin_spark.functions.sims import (
    batch_jaro_winkler,
    batch_levenshtein,
)
from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.matcher import featurize_pairs

L = [
    (1, "kevin smith", "san francisco"),
    (2, "oliver a", "palo alto"),
    (3, None, "fremont"),
]
R = [
    (10, "kevin smyth", "san francisco"),
    (11, "oliver amos", None),
]
CAND = [(1, 10), (1, 11), (2, 11), (3, 10)]


@pytest.fixture(scope="module")
def out_rows(spark):
    l = spark.createDataFrame(L, "id int, name string, city string")
    r = spark.createDataFrame(R, "id int, name string, city string")
    cand = spark.createDataFrame(CAND, "l_id int, r_id int")
    out = featurize_pairs(
        cand, "l_id", "r_id", l, r, "id", "id",
        {
            "name_jacc": {
                "l_attr": "name", "r_attr": "name",
                "tokenizer": WhitespaceTokenizer(return_set=True),
                "measure": "jaccard",
            },
            "name_jw": {"l_attr": "name", "r_attr": "name", "measure": "jaro_winkler"},
            "name_edit": {"l_attr": "name", "r_attr": "name", "measure": "edit_distance"},
            "city_edit": {"l_attr": "city", "r_attr": "city", "measure": "edit_distance"},
        },
    )
    assert out.columns == ["l_id", "r_id", "name_jacc", "name_jw", "name_edit", "city_edit"]
    return {(r.l_id, r.r_id): r for r in out.collect()}


def test_values_match_kernels(out_rows):
    ld = {i: (n, c) for i, n, c in L}
    rd = {i: (n, c) for i, n, c in R}

    def jacc(a, b):
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    for (li, ri), row in out_rows.items():
        ln, lc = ld[li]
        rn, rc = rd[ri]
        if ln is None or rn is None:
            assert row.name_jacc is None and row.name_jw is None and row.name_edit is None
        else:
            assert row.name_jacc == pytest.approx(jacc(ln, rn))
            assert row.name_jw == batch_jaro_winkler([ln], [rn])[0]
            assert row.name_edit == float(batch_levenshtein([ln], [rn])[0])
        if lc is None or rc is None:
            assert row.city_edit is None
        else:
            assert row.city_edit == float(batch_levenshtein([lc], [rc])[0])


def test_exact_match_features(out_rows):
    # (1, 10): same city, near-same name
    row = out_rows[(1, 10)]
    assert row.city_edit == 0.0
    assert row.name_edit == 1.0  # smith -> smyth
    assert 0.8 < row.name_jw < 1.0


def test_validation_errors(spark):
    l = spark.createDataFrame(L, "id int, name string, city string")
    cand = spark.createDataFrame(CAND, "l_id int, r_id int")
    with pytest.raises(AssertionError):
        featurize_pairs(cand, "l_id", "r_id", l, l, "id", "id", {})
    with pytest.raises(AssertionError):
        featurize_pairs(
            cand, "l_id", "r_id", l, l, "id", "id",
            {"l_id": {"l_attr": "name", "r_attr": "name", "measure": "jaro"}},
        )


def test_two_joins_only(spark):
    """Adding features must not add joins: the plan contains exactly the
    two attr-lookup joins regardless of feature count."""
    l = spark.createDataFrame(L, "id int, name string, city string")
    r = spark.createDataFrame(R, "id int, name string, city string")
    cand = spark.createDataFrame(CAND, "l_id int, r_id int")
    feats = {
        f"f{i}": {"l_attr": "name", "r_attr": "name", "measure": m}
        for i, m in enumerate(["jaro", "jaro_winkler", "edit_distance", "bag_distance"])
    }
    feats["f_city"] = {"l_attr": "city", "r_attr": "city", "measure": "jaro"}
    out = featurize_pairs(cand, "l_id", "r_id", l, r, "id", "id", feats)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 2
