"""BM25 ranked retrieval over an inverted-index join (Okapi BM25,
Robertson & Zaragoza, "The Probabilistic Relevance Framework: BM25 and
Beyond", FnTIR 2009; idf form per Lucene's non-negative variant).

Beyond-reference operator (the reference joins on symmetric set-similarity
only; conventions follow its filter-verify shape,
/root/reference/py_stringsimjoin/join/set_sim_join.py:16-139). BM25 is the
asymmetric query→corpus ranking a training-data pipeline needs that cosine
joins cannot express: term-frequency saturation (k1) and document-length
normalization (b) — "find the best k pages for this prompt/snippet" rather
than "find all pairs above t".

    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf(t,d)·(k1+1)
                                         / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

with BAG term frequencies on the corpus side and DISTINCT terms on the
query side (duplicated query terms score once — the common engine
convention; pass weighted queries by repeating the join row if needed).

Scale shape (100 TB test): the corpus half is the classic persistable
inverted index — one tokenize + explode + (doc, term) hash count, one
(term) df aggregation, one 2-scalar corpus-stats aggregate broadcast via
``crossJoin(broadcast(...))`` (never a driver action). Retrieval is an
equi-join of query terms against postings on the term key — candidate set
is exactly the docs sharing ≥1 query term, never a scan of non-matching
documents — followed by a per-(query, doc) aggregation and a per-query
window top-k. Zero Python anywhere. Skew: stopword terms are the Zipf
head; purge them with ``stop_terms`` (the standard IR move — they carry
near-zero idf anyway) rather than salting, which would only shuffle more
of what contributes least. ``build_bm25_postings`` exposes the index half
for write-once / probe-many workloads (bucket by ``term`` at production
scale).

Determinism: every op in the score is IEEE-exact EXCEPT the idf's ``ln``
— and Java's ``Math.log`` intrinsic differs from libm (Python/DuckDB) by
1 ulp on some inputs (measured: ln(1.3777…) = …7718 on Spark, …77177 on
both others), so the default ``idf_kind="lucene"`` is validated in pytest
at 1e-12 rather than by the cross-engine hash oracle. For the driver
oracle, ``idf_kind="rational"`` drops the log and uses the raw odds ratio
``(N − df + 0.5)/(df + 0.5)`` — division is correctly rounded everywhere,
so scores are bit-identical cross-engine (the same split as
operators/weighted.py's idf vs inv_df). ``exact_order=True`` additionally
folds each pair's per-term contributions in ascending-value order so the
float64 sum is reproducible. Ties in the top-k break on doc id ascending
— a total order, stable everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizers import Tokenizer, WhitespaceTokenizer
from ..plans.validation import validate_attr, validate_attr_type


def build_bm25_postings(
    corpus: DataFrame,
    id_attr: str,
    text_attr: str,
    tokenizer: Tokenizer | None = None,
    stop_terms: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The persistable index: ``(postings, dfreq, stats)`` =
    (x_id, _term, _tf, _dl), (_term, _df), (_n_docs, _avgdl — one row).
    Write postings bucketed by ``_term`` at production scale and every
    search probes it without touching document text again."""
    validate_attr(corpus, id_attr, "corpus")
    validate_attr(corpus, text_attr, "corpus")
    validate_attr_type(corpus, text_attr, "corpus")
    tok = tokenizer or WhitespaceTokenizer(return_set=False)
    from ..plans.layout import widen_small_scan

    base = (
        # tokenize + explode + the postings partial-agg run before the
        # first exchange — widen a narrow scan (plans/layout.py; no-op at
        # production split counts)
        widen_small_scan(
            corpus.select(F.col(id_attr).alias("x_id"), F.col(text_attr).alias("_t"))
        )
        .where(F.col("_t").isNotNull())
        .withColumn("_toks", tok.spark_col(F.col("_t")))
        # NOTE no size(_toks)>0 filter here: a pushable filter would drag the
        # tokenizer below the widening exchange back onto the narrow scan.
        # Empty-token docs instead drop out naturally: the explode emits no
        # term rows for them, and the corpus stats below are derived from the
        # PRE-stop-filter term rows, which cover exactly the docs with >=1
        # raw token — the same doc set the old filter kept.
        .select("x_id", F.size("_toks").alias("_dl"), "_toks")
    )
    all_terms = base.select("x_id", "_dl", F.explode("_toks").alias("_term"))
    terms = all_terms
    if stop_terms:
        terms = terms.where(~F.col("_term").isin(list(stop_terms)))
    postings = terms.groupBy("x_id", "_term").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    dfreq = postings.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
    # corpus stats over ALL indexed docs (incl. those made of only stop
    # terms' complement — dl counts every token, matching the standard
    # definition where length normalization sees the raw document); one
    # doc-keyed reduce of the pre-stop-filter term rows, then the same
    # count / sum-over-count arithmetic as before (integer sum → the
    # division sees bit-identical operands)
    doc_dl = all_terms.groupBy("x_id").agg(F.first("_dl").alias("_dl"))
    stats = doc_dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "_avgdl"
        ),
    )
    return postings, dfreq, stats


def bm25_topk(
    queries: DataFrame,
    corpus: DataFrame,
    q_id_attr: str,
    q_text_attr: str,
    x_id_attr: str,
    x_text_attr: str,
    k: int,
    tokenizer: Tokenizer | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    stop_terms: list[str] | None = None,
    idf_kind: str = "lucene",
    exact_order: bool = False,
    postings: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """(q_id, x_id, score, rank) — each query's ``k`` highest-BM25 corpus
    documents (rank 1-based; ties break on x_id ascending). Pass a
    persisted ``build_bm25_postings`` result to skip re-indexing (it must
    have been built with the same tokenizer / stop_terms)."""
    validate_attr(queries, q_id_attr, "queries")
    validate_attr(queries, q_text_attr, "queries")
    validate_attr_type(queries, q_text_attr, "queries")
    if not (k >= 1):
        raise AssertionError("k must be >= 1")
    if not (k1 >= 0 and 0 <= b <= 1):
        raise AssertionError("require k1 >= 0 and 0 <= b <= 1")
    if idf_kind not in ("lucene", "rational"):
        raise AssertionError(f"unknown idf_kind {idf_kind!r}")
    tok = tokenizer or WhitespaceTokenizer(return_set=False)
    if postings is None:
        postings = build_bm25_postings(
            corpus, x_id_attr, x_text_attr, tok, stop_terms
        )
    post, dfreq, stats = postings

    qterms = (
        queries.select(F.col(q_id_attr).alias("q_id"), F.col(q_text_attr).alias("_t"))
        .where(F.col("_t").isNotNull())
        .select("q_id", F.explode(F.array_distinct(tok.spark_col(F.col("_t")))).alias("_term"))
    )
    if stop_terms:
        qterms = qterms.where(~F.col("_term").isin(list(stop_terms)))

    nd = F.col("_n_docs").cast("double")
    dfd = F.col("_df").cast("double")
    odds = (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    idf = F.log(F.lit(1.0) + odds) if idf_kind == "lucene" else odds
    tf = F.col("_tf").cast("double")
    norm = tf + F.lit(float(k1)) * (
        F.lit(1.0 - float(b))
        + F.lit(float(b)) * F.col("_dl").cast("double") / F.col("_avgdl")
    )
    contrib = (idf * (tf * F.lit(float(k1) + 1.0)) / norm).alias("_c")

    # dfreq is vocabulary-sized (billions of terms on web corpora) — join it
    # on the shared _term shuffle key, never broadcast; only the 1-row stats
    # table is broadcast.
    hits = (
        qterms.join(post, "_term")
        .join(dfreq, "_term")
        .crossJoin(F.broadcast(stats))
        .select("q_id", "x_id", contrib)
    )
    if exact_order:
        scores = hits.groupBy("q_id", "x_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list("_c")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score")
        )
    else:
        scores = hits.groupBy("q_id", "x_id").agg(F.sum("_c").alias("score"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("x_id").asc())
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
        .select("q_id", "x_id", "score", "rank")
    )
