"""Deterministic dataset split assignment (train/val/test) by key hash.

Every training-data pipeline needs splits that are (a) stable across
reruns and engines, (b) independent of row order and partitioning, and
(c) leakage-safe — the same key always lands in the same split, so a
document and its recrawl (same canonical key) can never straddle
train/test. Random `rand()` splits violate all three.

Mechanism: the first 8 hex digits of ``md5(seed || '|' || key)`` are a
uniform draw in [0, 16^8); split boundaries are materialized as 8-digit
hex STRINGS and assignment is plain string comparison — hex digits
('0'-'9' < 'a'-'f') sort identically in every engine, so there is no
float conversion anywhere and the DuckDB oracle replays the assignment
byte-for-byte. Changing ``seed`` re-deals every key; adding rows never
moves existing keys between splits.

Scale shape: one scalar expression — no shuffle, no UDF, map-only at any
corpus size; whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr

_SPACE = 1 << 32  # 16^8 buckets from 8 hex digits


def _boundaries(weights: dict[str, float]) -> list[tuple[str, str]]:
    if not weights:
        raise AssertionError("weights must be a non-empty dict")
    total = float(sum(weights.values()))
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise AssertionError("weights must be non-negative with a positive sum")
    names = list(weights)
    out, acc = [], 0.0
    for name in names[:-1]:
        acc += float(weights[name]) / total
        out.append((name, format(min(int(acc * _SPACE), _SPACE - 1), "08x")))
    # the last split's bound is 'g' (> every hex digit): an always-true
    # upper bound, so float rounding in the cumulative sum can never drop
    # a key into no split
    out.append((names[-1], "g"))
    return out


def split_hash_col(key: Column, seed: str = "") -> Column:
    """First 8 hex digits of md5(seed || '|' || key) — the split draw."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 8
    )


def assign_splits(
    df: DataFrame,
    key_attr: str,
    weights: dict[str, float] | None = None,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` assigning each row a split by its key's hash draw.

    ``weights`` maps split name → relative weight (normalized; insertion
    order fixes the boundary order — use the same dict in every engine).
    Default ``{"train": 0.9, "val": 0.05, "test": 0.05}``. NULL keys get
    a NULL split (md5 of NULL is NULL — surface them, don't hide them in
    train).
    """
    validate_attr(df, key_attr, "assign_splits input")
    if out_col in df.columns:
        raise AssertionError(f"{out_col!r} already exists on the input")
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    h = split_hash_col(F.col(key_attr), seed)
    expr = F.lit(None).cast("string")
    for name, bound in reversed(_boundaries(weights)):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    # NULL hash (NULL key) falls through every when() to the NULL literal
    return df.withColumn(out_col, expr)


def split_bounds_sql(key_expr: str, weights: dict[str, float] | None = None, seed: str = "") -> str:
    """DuckDB CASE expression replaying :func:`assign_splits` exactly."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    h = f"substr(md5('{seed}|' || ({key_expr})::VARCHAR), 1, 8)"
    cases = "".join(
        f" WHEN {h} < '{bound}' THEN '{name}'"
        for name, bound in _boundaries(weights)
    )
    return f"CASE{cases} END"
