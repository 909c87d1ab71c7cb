"""Blocking-rule composition: OR-combine candidate generators, keep provenance.

Production record linkage rarely blocks on ONE rule: recall comes from the
UNION of several cheap generators (token overlap, phonetic key, sorted
neighborhood, LSH buckets, ...), each missing different true pairs. The
reference engine exposes single blockers only (its filters,
/root/reference/py_stringsimjoin/filter/*.py); this module is the
composition layer on top of this repo's blockers:

* ``combine_blockers`` — distinct union of any number of candidate-pair
  DataFrames, tagging every surviving pair with the SORTED list of rule
  names that generated it (provenance — which rule earns its cost is the
  first question a pipeline owner asks).
* ``blocking_rule_stats`` — per-rule pair count, unique contribution
  (pairs no other rule found), and share of the union — the decision table
  for dropping or keeping a rule.

Scale shape: one union (no shuffle) → one hash aggregation keyed on the
pair (the same key every downstream scorer shuffles on anyway). Rule names
ride as literals; provenance is ``collect_set`` + ``sort_array`` — no UDFs,
nothing collected. Works unchanged on 10^12-row unions: cost is the union's
size, which blocking already bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def combine_blockers(
    rules: dict[str, DataFrame],
    l_key: str,
    r_key: str,
) -> DataFrame:
    """Distinct union of candidate-pair tables with rule provenance.

    ``rules`` maps rule name → a DataFrame carrying at least
    ``(l_key, r_key)``; extra columns are dropped (provenance replaces
    them). Returns ``(l_key, r_key, rules: array<string>)`` with one row
    per distinct pair and ``rules`` the sorted names of every generator
    that produced it.
    """
    if not rules:
        raise AssertionError("rules must be a non-empty dict")
    tagged = []
    for name, df in rules.items():
        validate_attr(df, l_key, f"rule {name!r}")
        validate_attr(df, r_key, f"rule {name!r}")
        tagged.append(df.select(l_key, r_key, F.lit(name).alias("_rule")))
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    return u.groupBy(l_key, r_key).agg(
        F.sort_array(F.collect_set("_rule")).alias("rules")
    )


def blocking_rule_stats(combined: DataFrame) -> DataFrame:
    """Per-rule contribution table over ``combine_blockers`` output.

    Returns ``(rule, pairs, unique_pairs, share)`` where ``pairs`` is how
    many union pairs the rule generated, ``unique_pairs`` how many ONLY it
    generated, and ``share`` = pairs / total union pairs. One explode + one
    aggregation keyed on the rule name (tiny cardinality — the final agg is
    a handful of rows).
    """
    exploded = combined.select(
        F.explode("rules").alias("rule"),
        (F.size("rules") == 1).alias("_unique"),
    )
    stats = exploded.groupBy("rule").agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(F.col("_unique").cast("long")).alias("unique_pairs"),
    )
    # denominator: one scalar subquery worth of work — a single-row agg
    # cross-joined in (broadcast of one row, not a collect)
    denom = combined.agg(F.count(F.lit(1)).alias("_total"))
    out = stats.crossJoin(F.broadcast(denom)).select(
        "rule",
        "pairs",
        "unique_pairs",
        (F.col("pairs").cast("double") / F.col("_total").cast("double")).alias(
            "share"
        ),
    )
    return out
