"""Corpus-level PII scrub pass over a document table.

Thin operator layer over :mod:`..functions.pii` (the triple-form regex
spec): one map-only projection that emits, per document, the per-class
match counts, a ``has_pii`` flag, and the redacted text. Downstream a
training-data pipeline either drops flagged documents or keeps the
redacted column; both consume this one pass.

Scale shape: scalar expression chain only — no shuffle, no UDF, no
aggregation; whole-stage codegen end to end, column pruning reaches the
scan (only the key and text columns are read). At 10^12 documents this is
a pure map job bounded by scan bandwidth.

The reference engine has no analogue (it has no text-hygiene surface);
this follows the public Dolma/ROOTS-style regex-scrub design re-expressed
as Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pii import _resolve, pii_count_expr, redact_pii_expr
from ..plans.validation import validate_attr


def pii_stats(
    df: DataFrame,
    key_attr: str,
    text_attr: str,
    classes=None,
    redact: bool = True,
) -> DataFrame:
    """Per-document PII counts + optional redacted text.

    Returns ``(key_attr, n_<class>... per requested class, has_pii,
    redacted_text?)``. NULL text yields NULL counts, NULL ``has_pii`` and
    NULL ``redacted_text`` (the document is passed through, not judged).
    """
    validate_attr(df, key_attr, "pii_stats input")
    validate_attr(df, text_attr, "pii_stats input")
    # _resolve raises on unknown class names (same contract as the
    # functions-layer redact/count helpers) instead of silently dropping.
    names = [n for n, _, _ in _resolve(classes)]
    assert names, "pii_stats: classes resolved to an empty list"
    text = F.col(text_attr)
    cols = [F.col(key_attr)]
    cols += [pii_count_expr(text, n).alias(f"n_{n}") for n in names]
    total = None
    for n in names:
        c = pii_count_expr(text, n)
        total = c if total is None else total + c
    cols.append((total > 0).alias("has_pii"))
    if redact:
        cols.append(redact_pii_expr(text, classes).alias("redacted_text"))
    return df.select(*cols)
