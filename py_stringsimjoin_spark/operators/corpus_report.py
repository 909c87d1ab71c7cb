"""Corpus report — the one-pass dataset-card statistics block.

Every curation pipeline ends (and every incoming crawl starts) with the
same audit: how many documents, how much text, what language/domain mix,
how much exact duplication, how long is the tail. This operator computes
the whole block in a BOUNDED number of partial-aggregated passes and
returns two tiny DataFrames — the scalars and the per-group breakdown —
suitable for a manifest or a dataset card (Gebru et al., "Datasheets for
Datasets", CACM 2021). Beyond-reference (SURVEY.md §2.5).

Scale shape (100 TB test): one map-side-combined aggregation over the
corpus for the scalar block (counts, token/char moments, NULL/empty
tallies); one md5-keyed distinct-count aggregation for the exact-dup rate
(the operators/dedup.py key rule — never the raw text on the shuffle);
one group-keyed aggregation for the breakdown. Quantiles are EXACT
small-group sorts per group only in the breakdown's token percentiles —
dropped here in favor of fixed threshold buckets (len histograms), the
scan-friendly form (exact global quantiles at 10^12 rows are a sort; the
engine's profiler already exposes approx_percentile when an estimate is
acceptable — this report stays hash-exact for the oracle).

Determinism: counts are integers; means divide once in fixed order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr, validate_attr_type


def corpus_report(
    df: DataFrame,
    id_attr: str,
    text_attr: str,
    group_attr: str | None = None,
    len_buckets: tuple[int, ...] = (100, 1_000, 10_000),
) -> tuple[DataFrame, DataFrame | None]:
    """Returns ``(scalars, breakdown)``.

    ``scalars`` (one row): n_docs, n_null_text, n_empty_text, n_tokens,
    n_chars, mean_tokens, mean_chars, n_distinct_texts, exact_dup_docs,
    exact_dup_rate, plus one ``n_len_le_{b}`` char-length bucket count per
    threshold in ``len_buckets``.

    ``breakdown`` (one row per ``group_attr`` value, NULL group kept):
    n_docs, n_tokens, n_chars, mean_tokens, doc_share. ``None`` when no
    group attr is given."""
    validate_attr(df, id_attr, "df")
    validate_attr(df, text_attr, "df")
    validate_attr_type(df, text_attr, "df")
    for b in len_buckets:
        if b <= 0:
            raise AssertionError("len_buckets must be positive")

    t = F.col(text_attr)
    toks = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")
    base = df.select(
        F.col(id_attr).alias("_id"),
        t.alias("_t"),
        F.when(t.isNull(), None).otherwise(F.size(toks)).alias("_nt"),
        F.when(t.isNull(), None).otherwise(F.char_length(t)).alias("_nc"),
        *(
            []
            if group_attr is None
            else [F.col(group_attr).alias("_g")]
        ),
    )
    bucket_aggs = [
        F.count(F.when(F.col("_nc") <= b, 1)).alias(f"n_len_le_{b}")
        for b in len_buckets
    ]
    scal = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("_t").isNull(), 1)).alias("n_null_text"),
        F.count(F.when(F.col("_nt") == 0, 1)).alias("n_empty_text"),
        F.coalesce(F.sum("_nt"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.sum("_nc"), F.lit(0)).alias("n_chars"),
        *bucket_aggs,
    )
    dups = (
        base.where(F.col("_t").isNotNull())
        .groupBy(F.md5("_t").alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.count(F.lit(1)).alias("n_distinct_texts"),
            F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("exact_dup_docs"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("_n_nonnull"),
        )
    )
    nn = F.col("_n_nonnull").cast("double")
    scalars = scal.crossJoin(F.broadcast(dups)).select(
        "n_docs",
        "n_null_text",
        "n_empty_text",
        "n_tokens",
        "n_chars",
        F.when(
            F.col("n_docs") > F.col("n_null_text"),
            F.col("n_tokens").cast("double")
            / (F.col("n_docs") - F.col("n_null_text")).cast("double"),
        ).alias("mean_tokens"),
        F.when(
            F.col("n_docs") > F.col("n_null_text"),
            F.col("n_chars").cast("double")
            / (F.col("n_docs") - F.col("n_null_text")).cast("double"),
        ).alias("mean_chars"),
        "n_distinct_texts",
        "exact_dup_docs",
        F.when(nn > 0, F.col("exact_dup_docs").cast("double") / nn).alias(
            "exact_dup_rate"
        ),
        *[F.col(f"n_len_le_{b}") for b in len_buckets],
    )
    if group_attr is None:
        return scalars, None
    tot = base.agg(F.count(F.lit(1)).alias("_tot"))
    breakdown = (
        base.groupBy(F.col("_g").alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("_nt"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.sum("_nc"), F.lit(0)).alias("n_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "group",
            "n_docs",
            "n_tokens",
            "n_chars",
            (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
                "mean_tokens"
            ),
            (F.col("n_docs").cast("double") / F.col("_tot").cast("double")).alias(
                "doc_share"
            ),
        )
    )
    return scalars, breakdown
