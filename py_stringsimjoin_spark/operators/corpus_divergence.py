"""Corpus-vs-corpus term-distribution divergence — domain-shift measurement.

Compare two corpora (two crawls, two domains, train vs incoming delta) by
their unigram distributions: the standard pre-mixing diagnostic for "how
different is this new data" (domain-shift scoring in data-mixture design;
cf. the T5/Pile mixture analyses). Emits one row with:

* ``tv``        — total-variation distance, ``0.5 · Σ_w |p_w − q_w|``
* ``chi2``      — Pearson χ² divergence of p from the mixture m=(p+q)/2,
                  ``Σ_w (p_w − m_w)² / m_w`` (bounded, symmetric-ish
                  workhorse; avoids q_w = 0 blowups)
* ``js``        — Jensen–Shannon divergence (base-2, in [0, 1]),
                  ``0.5·KL(p‖m) + 0.5·KL(q‖m)``
* ``n_tokens_a/b``, ``vocab_a/b``, ``vocab_shared`` — the size context.

Determinism: ``tv`` and ``chi2`` are division/multiplication-only over
integer counts, folded in ascending order (sorted left fold — the bm25
``exact_order`` rule), so they are bit-identical cross-engine and form
the driver-oracle columns. ``js`` needs ``ln`` — Java's intrinsic is 1
ulp off libm on some inputs (the operators/bm25.py story), so it is
pytest-validated at 1e-12 and EXCLUDED from the hash oracle.

Scale shape (100 TB test): one token-keyed count per corpus
(partial-aggregated — the Zipf head combines map-side), one full-outer
join on the token key (vocabulary-sized, joined never broadcast), two
1-row total aggregates broadcast back, one ascending-fold reduction to a
single row. Nothing collects to the driver but the result row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr, validate_attr_type


def _counts(df: DataFrame, text_attr: str, side: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_attr))), r"\s+"), lambda t: t != ""
    )
    return (
        df.where(F.col(text_attr).isNotNull())
        .select(F.explode(toks).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias(f"_c{side}"))
    )


def corpus_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_attr_a: str,
    text_attr_b: str | None = None,
) -> DataFrame:
    """One-row divergence report between the two corpora's word
    distributions (see module docstring for the exact definitions)."""
    text_attr_b = text_attr_b or text_attr_a
    validate_attr(df_a, text_attr_a, "df_a")
    validate_attr_type(df_a, text_attr_a, "df_a")
    validate_attr(df_b, text_attr_b, "df_b")
    validate_attr_type(df_b, text_attr_b, "df_b")
    ca = _counts(df_a, text_attr_a, "a")
    cb = _counts(df_b, text_attr_b, "b")
    j = ca.join(cb, "_w", "full_outer").select(
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    tot = j.agg(
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
        F.count(F.lit(1)).alias("_vocab_union"),
        F.count(F.when(F.col("_ca") > 0, 1)).alias("_vocab_a"),
        F.count(F.when(F.col("_cb") > 0, 1)).alias("_vocab_b"),
        F.count(F.when((F.col("_ca") > 0) & (F.col("_cb") > 0), 1)).alias(
            "_vocab_shared"
        ),
    )
    p = F.col("_ca").cast("double") / F.col("_na").cast("double")
    q = F.col("_cb").cast("double") / F.col("_nb").cast("double")
    m = (p + q) / F.lit(2.0)
    tv_term = F.abs(p - q)
    chi2_term = ((p - m) * (p - m)) / m
    ln2 = F.log(F.lit(2.0))
    kl_p = F.when(p > 0.0, p * (F.log(p / m) / ln2)).otherwise(F.lit(0.0))
    kl_q = F.when(q > 0.0, q * (F.log(q / m) / ln2)).otherwise(F.lit(0.0))
    js_term = F.lit(0.5) * kl_p + F.lit(0.5) * kl_q

    def _fold(col, alias):
        return F.aggregate(
            F.array_sort(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(alias)

    terms = j.crossJoin(F.broadcast(tot)).select(
        tv_term.alias("_tv"),
        chi2_term.alias("_chi2"),
        js_term.alias("_js"),
        "_na",
        "_nb",
        "_vocab_a",
        "_vocab_b",
        "_vocab_shared",
    )
    return terms.groupBy(
        "_na", "_nb", "_vocab_a", "_vocab_b", "_vocab_shared"
    ).agg(
        _fold(F.col("_tv"), "_tv_sum"),
        _fold(F.col("_chi2"), "chi2"),
        _fold(F.col("_js"), "js"),
    ).select(
        (F.lit(0.5) * F.col("_tv_sum")).alias("tv"),
        "chi2",
        "js",
        F.col("_na").cast("long").alias("n_tokens_a"),
        F.col("_nb").cast("long").alias("n_tokens_b"),
        F.col("_vocab_a").cast("long").alias("vocab_a"),
        F.col("_vocab_b").cast("long").alias("vocab_b"),
        F.col("_vocab_shared").cast("long").alias("vocab_shared"),
    )
