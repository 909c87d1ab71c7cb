"""Bigram collocation mining — PMI / lift-ranked adjacent word pairs.

Church & Hanks, "Word Association Norms, Mutual Information, and
Lexicography" (CL 1990): score each adjacent token pair by pointwise
mutual information

    pmi(x, y) = ln p(x,y) / (p(x)·p(y)),   lift = exp(pmi)
    p(x,y) = c_xy / N_bigrams,  p(x) = c_x / N_tokens

— the standard corpus-statistics pass for vocabulary induction, tokenizer
merge-rule seeding (a BPE-ish signal), stopword-phrase discovery, and
boilerplate n-gram detection in a training-data pipeline. The reference
engine has no corpus-statistics surface (SURVEY.md §2.5);
``textstats.top_tokens`` covers unigrams — this adds the pair order
statistics. ``min_count`` applies the usual low-frequency PMI guard
(hapax pairs otherwise dominate the top of the ranking).

Scale shape (100 TB test): token/bigram extraction is map-only (an index
explode over each doc's token array — no self-join); three hash
aggregations (bigram counts, unigram counts, two scalar totals), each
partial-aggregated map-side; unigram counts join the bigram table on the
token keys (vocabulary-sized — joined, never broadcast, the bm25 dfreq
rule); final top-k is ``orderBy().limit(k)`` = per-partition TakeOrdered +
driver merge of k rows, NOT a global sort or single-partition window.

Determinism: all counts are integers; ``lift`` multiplies/divides them in
one fixed operation order, so both engines round identically at every
step and the (lift DESC, w1, w2) top-k order is bit-stable cross-engine.
``pmi = ln(lift)`` is exposed too but — as with BM25's idf — Java's
``Math.log`` can differ from libm by 1 ulp, so oracle comparisons use
``lift`` and pytest validates ``pmi`` at 1e-12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizers import Tokenizer, WhitespaceTokenizer
from ..plans.validation import validate_attr, validate_attr_type


def top_collocations(
    df: DataFrame,
    id_attr: str,
    text_attr: str,
    k: int = 50,
    min_count: int = 5,
    tokenizer: Tokenizer | None = None,
) -> DataFrame:
    """(w1, w2, pair_count, lift, pmi, rank): the corpus's top-``k``
    adjacent-pair collocations with ≥ ``min_count`` occurrences, ranked by
    lift (ties → w1, w2 ascending). The tokenizer must preserve token
    order (``return_set=False``)."""
    validate_attr(df, id_attr, "df")
    validate_attr(df, text_attr, "df")
    validate_attr_type(df, text_attr, "df")
    if not (k >= 1 and min_count >= 1):
        raise AssertionError("require k >= 1 and min_count >= 1")
    tok = tokenizer or WhitespaceTokenizer(return_set=False)
    if getattr(tok, "return_set", False):
        raise AssertionError("collocations need an order-preserving (bag) tokenizer")

    from ..plans.layout import widen_small_scan

    base = (
        # raw-text null filter BELOW the widening exchange (free pushdown);
        # no size(_toks)>0 filter — a predicate on the computed array is
        # pushable and would drag the tokenizer below the exchange, and
        # empty docs contribute nothing anyway (explode drops them, the
        # totals sums see 0)
        widen_small_scan(
            df.select(F.col(text_attr).alias("_t")).where(F.col("_t").isNotNull())
        ).select(tok.spark_col(F.col("_t")).alias("_toks"))
    )
    toks = base.select(F.explode("_toks").alias("_w"))
    uni = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    totals = base.agg(
        F.sum(F.size("_toks")).alias("_nw"),
        F.sum(F.greatest(F.size("_toks") - 1, F.lit(0))).alias("_nb"),
    )
    bi = (
        # WHEN-guarded sequence instead of a size>=2 filter (pushdown
        # hazard; sequence(1, size-1) would go descending for size<2)
        base.select(
            F.explode(
                F.when(
                    F.size("_toks") >= 2,
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("_i"),
            "_toks",
        )
        .select(
            F.element_at("_toks", F.col("_i")).alias("w1"),
            F.element_at("_toks", F.col("_i") + 1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= int(min_count))
    )
    c1 = uni.select(F.col("_w").alias("w1"), F.col("_c").alias("_c1"))
    c2 = uni.select(F.col("_w").alias("w2"), F.col("_c").alias("_c2"))
    scored = (
        bi.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lift",
            (
                (
                    F.col("pair_count").cast("double")
                    * F.col("_nw").cast("double")
                )
                * F.col("_nw").cast("double")
            )
            / (
                (F.col("_nb").cast("double") * F.col("_c1").cast("double"))
                * F.col("_c2").cast("double")
            ),
        )
    )
    top = (
        scored.orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(int(k))
        .withColumn("pmi", F.log("lift"))
    )
    w = Window.orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
    return top.select(
        "w1",
        "w2",
        "pair_count",
        "lift",
        "pmi",
        F.row_number().over(w).cast("long").alias("rank"),
    )
