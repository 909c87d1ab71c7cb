"""Benchmark decontamination — word-n-gram overlap between a training
corpus and an evaluation/benchmark set.

The GPT-3 appendix-C / PaLM / Llama eval-hygiene pass (Brown et al. 2020):
an eval document is *contaminated* if it shares any length-``n`` word
n-gram with the training corpus; pipelines either drop such eval items or
report the overlap fraction. Beyond-reference (SURVEY.md §2.5) — this is
the two-table asymmetric cousin of the n-gram dedup family
(operators/dedup.py) with per-document set semantics.

Scale shape (100 TB test): n-grams are DISTINCT per document (set
semantics — a repeated phrase inside one doc counts once), keyed by their
md5 hex (fixed 32-byte shuffle key, never the raw n-gram text). The train
side collapses to a corpus-wide DISTINCT n-gram set before the join — the
contamination test is an equi-join of the (much smaller) bench n-gram set
against it, partial-aggregated on both sides; no cross join, no Python.
``contamination_pairs`` keeps train doc ids for attribution and takes the
standard ``max_train_df`` purge (drop n-grams occurring in more than that
many train docs — boilerplate head, near-zero evidential value, all the
join skew), mirroring the meta-blocking block-purging rule.

Determinism: md5 on both engines over the identical space-joined n-gram
string; counts are integers; ``contamination`` is one exact division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr, validate_attr_type


def _doc_ngrams(
    df: DataFrame, id_attr: str, text_attr: str, n: int, lowercase: bool
) -> DataFrame:
    """(id, g): each document's DISTINCT word n-gram md5 keys."""
    t = F.trim(F.col(text_attr))
    if lowercase:
        t = F.lower(t)
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    from ..plans.layout import widen_small_scan

    return (
        # widened narrow scan; WHEN-guarded sequence instead of a size>=n
        # filter — a predicate over the computed token array is pushable and
        # would drag the tokenizer below the widening exchange (and
        # sequence(1, size-n+1) would go descending for short docs, so the
        # guard itself stays semantically required)
        widen_small_scan(df.select(F.col(id_attr).alias("id"), F.col(text_attr)))
        .select("id", toks.alias("_toks"))
        .select(
            "id",
            F.explode(
                F.when(
                    F.size("_toks") >= n,
                    F.sequence(F.lit(1), F.size("_toks") - F.lit(n) + 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("_i"),
            "_toks",
        )
        .select(
            "id",
            F.md5(F.array_join(F.slice("_toks", F.col("_i"), F.lit(n)), " ")).alias(
                "g"
            ),
        )
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    train_id_attr: str,
    train_text_attr: str,
    bench_id_attr: str,
    bench_text_attr: str,
    n: int = 13,
    lowercase: bool = True,
) -> DataFrame:
    """(bench_id, n_ngrams, n_hit, contamination, contaminated) for EVERY
    bench row: how many of its distinct word n-grams occur anywhere in the
    training corpus. Bench docs with fewer than ``n`` tokens report
    ``n_ngrams = 0`` and NULL contamination."""
    for df, a, t, side in (
        (train, train_id_attr, train_text_attr, "train"),
        (bench, bench_id_attr, bench_text_attr, "bench"),
    ):
        validate_attr(df, a, side)
        validate_attr(df, t, side)
        validate_attr_type(df, t, side)
    if not (n >= 1):
        raise AssertionError("n must be >= 1")
    bg = _doc_ngrams(bench, bench_id_attr, bench_text_attr, n, lowercase)
    tg = _doc_ngrams(train, train_id_attr, train_text_attr, n, lowercase).select(
        "g"
    ).distinct()
    per = bg.groupBy("id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = bg.join(tg, "g").groupBy("id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        bench.select(F.col(bench_id_attr).alias("id"))
        .join(per, "id", "left")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias("bench_id"),
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double"),
            ).alias("contamination"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    train_id_attr: str,
    train_text_attr: str,
    bench_id_attr: str,
    bench_text_attr: str,
    n: int = 13,
    lowercase: bool = True,
    max_train_df: int | None = None,
) -> DataFrame:
    """(bench_id, train_id, shared_ngrams): which train docs collide with
    which bench docs, for attribution/removal. ``max_train_df`` purges
    n-grams present in more than that many train docs before pairing."""
    if not (n >= 1):
        raise AssertionError("n must be >= 1")
    if max_train_df is not None and max_train_df < 1:
        raise AssertionError("max_train_df must be >= 1")
    bg = _doc_ngrams(bench, bench_id_attr, bench_text_attr, n, lowercase)
    tg = _doc_ngrams(train, train_id_attr, train_text_attr, n, lowercase)
    if max_train_df is not None:
        keep = (
            tg.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= int(max_train_df))
            .select("g")
        )
        tg = tg.join(keep, "g")
    return (
        bg.select(F.col("id").alias("bench_id"), "g")
        .join(tg.select(F.col("id").alias("train_id"), "g"), "g")
        .groupBy("bench_id", "train_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
