"""Text analysis operators for training-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, whole-stage
codegen) — no UDFs anywhere:

* ``language_id``       — stopword-hit n-gram heuristic over a small
                          per-language marker list
* ``quality_score``     — length / punctuation / stopword-ratio composite
* ``token_stats``       — whitespace token count + BPE-ish subword count
* ``fingerprint``       — polynomial rolling hash of the normalized text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "por", "con"],
}


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != "")


def _hit_count(words: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def language_id_col(text_col: Column) -> Column:
    """Predicted language code ('en'/'de'/'fr'/'es'/'und') by max stopword
    hits; ties and zero hits resolve deterministically ('und' when no
    marker appears, else alphabetically-first max)."""
    words = _words(text_col)
    scored = F.array(
        *[
            F.struct(
                (-_hit_count(words, STOPWORDS[lang])).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_min(scored)
    return F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_col(text_col: Column) -> Column:
    """[0,1] composite: length band + alpha ratio + mean word length band +
    stopword presence (all deterministic arithmetic)."""
    n = F.length(text_col)
    words = _words(text_col)
    n_words = F.size(words)
    alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n).otherwise(0.0)
    mean_wlen = F.when(n_words > 0, (alpha + 0).cast("double") / n_words).otherwise(0.0)
    len_band = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(
        F.when(n > 0, 0.5).otherwise(0.0)
    )
    wlen_band = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.5)
    stop_hits = _hit_count(words, [w for ws in STOPWORDS.values() for w in ws])
    stop_band = F.when(n_words == 0, 0.0).otherwise(
        F.least(stop_hits.cast("double") / 2.0, F.lit(1.0))
    )
    return F.round(
        0.3 * len_band + 0.3 * alpha_ratio + 0.2 * wlen_band + 0.2 * stop_band, 6
    )


def token_count_col(text_col: Column) -> Column:
    return F.size(_words(text_col))


def subword_count_col(text_col: Column) -> Column:
    """BPE-ish proxy: count of alnum runs + punctuation marks (what a
    byte-pair tokenizer roughly splits on)."""
    runs = F.size(
        F.filter(F.split(text_col, r"[^A-Za-z0-9]+"), lambda t: t != "")
    )
    punct = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))
    return runs + punct


def fingerprint_col(text_col: Column) -> Column:
    """Polynomial rolling hash (base 31, mod 2^31-1) folded over the
    lowercased words' 28-bit md5 hashes — a deterministic document
    fingerprint via ``F.aggregate`` (no UDF). Operands stay < 2^63, so the
    identical formula reproduces in any engine (incl. the DuckDB oracle)."""
    words = _words(text_col)
    hashes = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long")
    )
    mod = F.lit((1 << 31) - 1)
    return F.aggregate(
        hashes, F.lit(0).cast("long"), lambda acc, c: (acc * 31 + c) % mod
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        language_id_col(t).alias("pred_lang"),
        quality_score_col(t).alias("quality"),
        token_count_col(t).alias("n_tokens"),
        subword_count_col(t).alias("n_subwords"),
        F.length(t).alias("n_chars"),
        fingerprint_col(t).alias("fingerprint"),
    )


def unigram_cross_entropy(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document unigram cross-entropy vs the corpus language model.

    The declarative stand-in for the CCNet-style LM-perplexity quality
    signal (no external KenLM in a pure-Spark pipeline): train a unigram
    model on the corpus itself — ``p(w) = count(w) / total`` over all
    word occurrences — and score each document with
    ``H(d) = -(1/|d|) * Σ_{w∈d} log2 p(w)`` (bag semantics: repeated
    words count every time). Low H = made of common words (boilerplate /
    template-like); high H = rare-word-heavy (jargon, noise, or rich
    content) — pipelines gate on both tails.

    Returns ``(id_col, n_words, cross_entropy)``; NULL text or an empty
    document yields NULL entropy. Determinism note: the per-document sum
    is an explicit left fold over the SORTED log-probability array, and
    log2 is computed as ``ln(x)/ln(2)`` — both choices so a replaying
    engine (the DuckDB oracle) reproduces the float64 result bit-exactly
    (float addition isn't associative; libm log2 differs by 1 ulp across
    engines, ln does not).

    Scale shape: one explode + one (word)-keyed count (partial-aggregated
    — the Zipf head combines map-side), one broadcast-sized total, one
    join back on word, one per-doc collect. No UDFs, nothing collected on
    the driver.
    """
    from ..plans.layout import widen_small_scan

    words = widen_small_scan(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("_w")
    )
    freq = words.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    total = freq.agg(F.sum("_c").alias("_total"))
    lp = (
        words.join(freq, "_w")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (
                F.log(F.col("_c").cast("double") / F.col("_total").cast("double"))
                / F.log(F.lit(2.0))
            ).alias("_lp"),
        )
    )
    agg = lp.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.aggregate(
            F.array_sort(F.collect_list("_lp")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sum"),
    )
    return df.select(id_col, text_col).join(agg, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
        (-F.col("_sum") / F.col("n_words").cast("double")).alias("cross_entropy"),
    )


def bigram_cross_entropy(
    df: DataFrame, id_col: str, text_col: str, lam: float = 0.75,
    kind: str = "log2",
) -> DataFrame:
    """Per-document cross-entropy vs an interpolated bigram corpus LM —
    the second-order CCNet-style quality signal next to
    ``unigram_cross_entropy`` (word-ORDER sensitivity: shuffled boilerplate
    and bag-identical spam separate only at the bigram level).

    Model (Jelinek–Mercer interpolation, the standard no-OOV-smoothing-
    needed form when trained on the scoring corpus itself):

        p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i) / c(w_{i-1})
                         + (1 - lam) * c(w_i) / N
        H(d) = -(1 / (|d| - 1)) * Σ_{i=2..|d|} log2 p(w_i | w_{i-1})

    with c(·) corpus occurrence counts and N total tokens (history counts
    use the plain unigram count — the usual practical convention).
    Returns ``(id_col, n_bigrams, cross_entropy)``; documents with < 2
    tokens get ``n_bigrams = 0`` and NULL entropy.

    Determinism: one fixed op order inside the probability (two divisions,
    one lam-weighted sum), log2 as ln/ln2, per-doc sum as a sorted left
    fold. Unlike the unigram module, the interpolated probabilities DO hit
    inputs where Java's ``Math.log`` intrinsic is 1 ulp off libm (the
    operators/bm25.py idf story), so ``kind="log2"`` is pytest-validated
    rather than hash-oracled; ``kind="mean_prob"`` drops the log and
    returns the mean interpolated bigram probability (column
    ``mean_prob``, higher = more predictable text) — division and the
    sorted fold are correctly rounded everywhere, so that form is
    bit-identical cross-engine and is the driver-oracle configuration.

    Scale shape: map-only bigram extraction (index explode, no self-join);
    (bigram)- and (word)-keyed partial-aggregated counts; three joins back
    on those keys (vocabulary tables are JOINED, never broadcast — only
    the 1-row total broadcasts); one per-doc aggregation. Zero Python.
    """
    if not (0.0 <= lam <= 1.0):
        raise AssertionError("lam must be in [0, 1]")
    if kind not in ("log2", "mean_prob"):
        raise AssertionError(f"unknown kind {kind!r}")
    from ..plans.layout import widen_small_scan

    # null filter on the RAW text (pushes to the scan for free) rather than
    # on the computed token array — a predicate on _toks is pushable and
    # would drag the tokenizer below the widening exchange; _words() is
    # non-null exactly when the text is
    toks = widen_small_scan(
        df.select(F.col(id_col), F.col(text_col)).where(F.col(text_col).isNotNull())
    ).select(F.col(id_col), _words(F.col(text_col)).alias("_toks"))
    words = toks.select(id_col, F.explode("_toks").alias("_w"))
    uni = words.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    total = uni.agg(F.sum("_c").alias("_total"))
    occ = (
        # per-row WHEN guard instead of a size>=2 filter (same pushdown
        # hazard as above); sequence(1, size-1) would go DESCENDING for
        # size<2, so the guard stays semantically required
        toks.select(
            id_col,
            F.explode(
                F.when(
                    F.size("_toks") >= 2,
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("_i"),
            "_toks",
        )
        .select(
            id_col,
            F.element_at("_toks", F.col("_i")).alias("_w1"),
            F.element_at("_toks", F.col("_i") + 1).alias("_w2"),
        )
    )
    big = occ.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_cxy"))
    c1 = uni.select(F.col("_w").alias("_w1"), F.col("_c").alias("_cx"))
    c2 = uni.select(F.col("_w").alias("_w2"), F.col("_c").alias("_cy"))
    p = (
        F.lit(float(lam))
        * (F.col("_cxy").cast("double") / F.col("_cx").cast("double"))
        + F.lit(1.0 - float(lam))
        * (F.col("_cy").cast("double") / F.col("_total").cast("double"))
    )
    val = (F.log(p) / F.log(F.lit(2.0))) if kind == "log2" else p
    lp = (
        occ.join(big, ["_w1", "_w2"])
        .join(c1, "_w1")
        .join(c2, "_w2")
        .crossJoin(F.broadcast(total))
        .select(id_col, val.alias("_lp"))
    )
    agg = lp.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list("_lp")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sum"),
    )
    out_col = "cross_entropy" if kind == "log2" else "mean_prob"
    sign = -F.col("_sum") if kind == "log2" else F.col("_sum")
    return df.select(id_col).join(agg, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
        (sign / F.col("n_bigrams").cast("double")).alias(out_col),
    )


def doc_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
    min_df: int = 1,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Per-document tf-idf keyword extraction: ``(id_col, token, tf,
    doc_freq, score, rank)`` — each document's ``k`` highest-scoring terms
    (Sparck Jones idf weighting; the per-doc summary a curation pipeline
    attaches for search facets, topic audits, and cheap doc sketches).

    ``score = tf · N / df`` — the log-free "rational" idf form (the
    operators/bm25.py / weighted.py determinism split): tf, N, df are all
    integers, so the score is two fixed-order float64 ops and the
    (score DESC, token ASC) per-doc ranking is bit-identical cross-engine;
    the ln form of idf differs by 1 ulp between Java and libm.
    ``min_df`` / ``max_df_frac`` apply the usual df guards (hapax noise /
    stopword head — the same Zipf head plans/skew.py salts).

    Scale shape: one explode + one (doc, token) bag count + one
    token-keyed df aggregation joined back on the token key (vocabulary-
    sized — joined, never broadcast); the per-doc top-k is a
    WindowGroupLimit partitioned by doc, not a global sort. Zero Python.
    """
    if not (k >= 1 and min_df >= 1):
        raise AssertionError("require k >= 1 and min_df >= 1")
    if max_df_frac is not None and not (0.0 < max_df_frac <= 1.0):
        raise AssertionError("max_df_frac must be in (0, 1]")
    from ..plans.layout import widen_small_scan

    words = widen_small_scan(df.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id", F.explode(_words(F.col(text_col))).alias("_w")
    )
    tf = words.groupBy("_id", "_w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("_w").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.col(id_col)).where(
        F.col(id_col).isNotNull()
    ).agg(F.count(F.lit(1)).alias("_n"))
    dfreq = dfreq.where(F.col("doc_freq") >= int(min_df))
    scored = tf.join(dfreq, "_w").crossJoin(F.broadcast(n_docs))
    if max_df_frac is not None:
        scored = scored.where(
            F.col("doc_freq").cast("double")
            <= F.lit(float(max_df_frac)) * F.col("_n").cast("double")
        )
    scored = scored.withColumn(
        "score",
        (F.col("tf").cast("double") * F.col("_n").cast("double"))
        / F.col("doc_freq").cast("double"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("_w").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias("token"),
            "tf",
            "doc_freq",
            "score",
            "rank",
        )
    )


def top_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary head: the ``k`` most frequent word tokens.

    Returns ``(token, freq, doc_freq, rank)`` — total occurrences, number
    of distinct documents containing the token, and a dense 1-based rank
    by ``(freq desc, token asc)`` (deterministic ties). This is stopword
    discovery / Zipf-head auditing: the same head the skew planner salts
    (plans/skew.py) and meta-blocking purges, exposed as a table a
    pipeline owner can inspect or feed back as a stop-token list.

    Scale shape: one explode + one token-keyed aggregation computing freq
    and doc_freq together (``count_distinct(id)`` per token — the heavy
    half — partial-aggregates after an exact (token, id) distinct whose
    shuffle key is the token); the final top-k is a single-partition sort
    of vocabulary-sized data bounded by ``k`` via TakeOrdered, never a
    full global sort of the corpus.
    """
    from ..plans.layout import widen_small_scan

    words = widen_small_scan(df.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id", F.explode(_words(F.col(text_col))).alias("_w")
    )
    stats = words.groupBy("_w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.count_distinct("_id").alias("doc_freq"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("freq").desc(), F.col("_w").asc())
    return (
        stats.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
        .select(F.col("_w").alias("token"), "freq", "doc_freq", "rank")
    )
