"""combine_blockers / blocking_rule_stats: multi-rule union with provenance."""

import pytest

from py_stringsimjoin_spark.operators.blocking import (
    blocking_rule_stats,
    combine_blockers,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["l_id", "r_id"])


def test_combine_blockers_provenance(spark):
    a = _pairs(spark, [(1, 2), (1, 3)])
    b = _pairs(spark, [(1, 2), (4, 5)])
    out = {
        (r.l_id, r.r_id): r.rules
        for r in combine_blockers({"a": a, "b": b}, "l_id", "r_id").collect()
    }
    assert out[(1, 2)] == ["a", "b"]  # both rules; sorted names
    assert out[(1, 3)] == ["a"]
    assert out[(4, 5)] == ["b"]
    assert len(out) == 3  # distinct union


def test_combine_blockers_dedups_within_rule(spark):
    a = _pairs(spark, [(1, 2), (1, 2), (1, 2)])
    out = combine_blockers({"a": a}, "l_id", "r_id").collect()
    assert len(out) == 1 and out[0].rules == ["a"]


def test_blocking_rule_stats(spark):
    a = _pairs(spark, [(1, 2), (1, 3)])
    b = _pairs(spark, [(1, 2), (4, 5), (6, 7)])
    combined = combine_blockers({"a": a, "b": b}, "l_id", "r_id")
    stats = {r.rule: r for r in blocking_rule_stats(combined).collect()}
    assert stats["a"].pairs == 2 and stats["a"].unique_pairs == 1
    assert stats["b"].pairs == 3 and stats["b"].unique_pairs == 2
    total = 4  # distinct pairs in the union
    assert stats["a"].share == pytest.approx(2 / total)
    assert stats["b"].share == pytest.approx(3 / total)


def test_combine_blockers_validation(spark):
    a = _pairs(spark, [(1, 2)])
    with pytest.raises(AssertionError):
        combine_blockers({}, "l_id", "r_id")
    with pytest.raises(Exception):
        combine_blockers({"a": a}, "nope", "r_id")
