"""Corpus-hygiene operators for web-text training pipelines.

Two standard cleaning stages that sit next to the dedup suite
(``operators/dedup.py``) in an LLM data pipeline — the reference engine has
no corpus-cleaning surface at all (SURVEY.md §2.5); these are
beyond-reference pipeline components in the same style as textstats:

* ``repetition_stats`` — per-document repetition signals in the style of the
  Gopher quality rules: duplicate-line fraction, duplicate-line character
  fraction, duplicate word-n-gram fraction, and the fraction of n-gram
  occurrences taken by the single most frequent n-gram. Everything except
  the top-n-gram mode is a pure per-row JVM array expression (no shuffle);
  the mode needs one (doc, ngram)-keyed aggregate, which partial
  (map-side) aggregation keeps skew-safe at corpus scale.
* ``dedup_spans`` / ``dedup_lines`` — corpus-level removal of repeated text
  segments (C4 removes repeated three-sentence spans; RefinedWeb removes
  repeated lines). A segment is either a non-overlapping ``span_words``-word
  window (``dedup_spans`` — the right unit when the text has no line
  structure) or a physical line (``dedup_lines``). Every segment hashes to
  md5; one global GROUP BY md5 with partial aggregation counts occurrences
  and finds the first occurrence (min (doc_id, pos) — deterministic);
  segments rejoin to their counts and each document is rebuilt from its
  retained segments in position order. ``keep="first"`` keeps one copy of
  each repeated segment (C4 semantics); ``keep="unique"`` drops all copies
  (strict RefinedWeb line rule).

Scale shape: the only wide operations are one hash aggregate and one
equi-join keyed on the segment hash, plus the per-document rebuild
aggregate. A pathologically hot segment (the same boilerplate line on
billions of pages) collapses map-side in the count aggregate; the rejoin
sees the hot key once per occurrence, which AQE's skew-join split handles.
Nothing is collected to the driver. md5 keying bounds shuffle-key width at
32 bytes regardless of segment length (collision odds at 10^12 segments:
~10^-15 — documented, accepted).

Both operators are exactly reproducible in ANSI SQL (driver oracles
``repetition_stats_docs`` / ``span_dedup_docs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizers import _escape_regex_char


def _nonempty_split(col, pattern: str):
    return F.filter(F.split(col, pattern), lambda x: F.trim(x) != "")


def _words(col):
    return _nonempty_split(F.trim(col), r"\s+")


def _sum_lengths(arr):
    return F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def _ngrams(words, n: int):
    """Word n-gram shingles (stride 1), [] when there are fewer than n
    words — same windowing as functions.tokenizers.ShingleTokenizer."""
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - n + 1, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(words) < n, empty).otherwise(shingles)


def _safe_frac(num, den):
    zero = F.lit(0.0)
    return F.round(
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(zero), 6
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
    line_delim: str = "\n",
) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality rules).

    Returns (id, n_lines, n_ngrams, dup_line_frac, dup_line_char_frac,
    dup_ngram_frac, top_ngram_frac):

    * ``dup_line_frac``      — 1 − distinct/total over non-blank lines;
    * ``dup_line_char_frac`` — 1 − chars(distinct lines)/chars(all lines),
      i.e. the character mass sitting in repeated copies of a line;
    * ``dup_ngram_frac``     — 1 − distinct/total over word n-grams;
    * ``top_ngram_frac``     — occurrences of the most frequent n-gram /
      total n-gram occurrences (the "one phrase dominates the page" signal).

    All fractions are 0.0 for documents without lines/n-grams and NULL for
    NULL text. The first three are pure per-row array expressions (no
    shuffle); ``top_ngram_frac`` is one (id, ngram) hash aggregate with
    map-side partial aggregation, then a per-id max — both skew-safe.
    """
    if ngram_n < 1:
        raise ValueError("ngram_n must be >= 1")
    t = F.col(text_col)
    delim_pat = "".join(_escape_regex_char(c) for c in line_delim)
    lines = _nonempty_split(t, delim_pat)
    dlines = F.array_distinct(lines)
    words = _words(t)
    ngrams = _ngrams(words, ngram_n)
    dngrams = F.array_distinct(ngrams)

    def _nn(expr, typ):  # NULL text -> NULL stat, not 0
        return F.when(t.isNull(), F.lit(None).cast(typ)).otherwise(expr)

    base = docs.select(
        F.col(id_col),
        _nn(F.size(lines).cast("long"), "long").alias("n_lines"),
        _nn(F.size(ngrams).cast("long"), "long").alias("n_ngrams"),
        _nn(
            _safe_frac(F.size(lines) - F.size(dlines), F.size(lines)), "double"
        ).alias("dup_line_frac"),
        _nn(
            _safe_frac(
                _sum_lengths(lines) - _sum_lengths(dlines), _sum_lengths(lines)
            ),
            "double",
        ).alias("dup_line_char_frac"),
        _nn(
            _safe_frac(F.size(ngrams) - F.size(dngrams), F.size(ngrams)), "double"
        ).alias("dup_ngram_frac"),
        t.isNull().alias("_txt_null"),
    )

    top = (
        docs.select(F.col(id_col), F.explode(ngrams).alias("_ng"))
        .groupBy(id_col, "_ng")
        .agg(F.count("*").alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.max("_cnt").alias("_mx"),
            F.sum("_cnt").alias("_tot"),
        )
        .select(
            F.col(id_col),
            _safe_frac(F.col("_mx"), F.col("_tot")).alias("top_ngram_frac"),
        )
    )

    return base.join(top, on=id_col, how="left").select(
        F.col(id_col),
        "n_lines",
        "n_ngrams",
        "dup_line_frac",
        "dup_line_char_frac",
        "dup_ngram_frac",
        F.when(F.col("_txt_null"), F.lit(None).cast("double"))
        .otherwise(F.coalesce(F.col("top_ngram_frac"), F.lit(0.0)))
        .alias("top_ngram_frac"),
    )


def _dedup_segments(
    docs: DataFrame,
    segments: DataFrame,
    id_col: str,
    text_col: str,
    joiner: str,
    keep: str,
    force_col: str | None = None,
) -> DataFrame:
    """Shared core of dedup_spans/dedup_lines: ``segments`` is
    (id, _pos, _seg) with _pos unique per id; rebuilds each document from
    the retained segments joined by ``joiner``. Rows where ``force_col`` is
    true (blank lines in dedup_lines) bypass dedup entirely: they never
    enter the occurrence count and are always retained."""
    if keep not in ("first", "unique"):
        raise ValueError("keep must be 'first' or 'unique'")
    seg = segments.withColumn("_h", F.md5(F.col("_seg")))
    participating = seg if force_col is None else seg.where(~F.col(force_col))
    # one partial-aggregated pass: occurrence count + deterministic first
    # occurrence per distinct segment (min over (id, pos) structs orders
    # lexicographically). Partial agg collapses hot segments map-side.
    summary = participating.groupBy("_h").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct(F.col(id_col).alias("i"), F.col("_pos").alias("p"))).alias(
            "_first"
        ),
    )
    # left join: forced rows may carry hashes absent from the summary
    marked = seg.join(summary, on="_h", how="left")
    kept = F.col("_cnt") == 1
    if keep == "first":
        kept = kept | (
            (F.col("_first.i") == F.col(id_col)) & (F.col("_first.p") == F.col("_pos"))
        )
    if force_col is not None:
        kept = F.col(force_col) | kept
    in_dedup = F.lit(True) if force_col is None else ~F.col(force_col)
    agg = marked.groupBy(id_col).agg(
        F.sum(F.when(in_dedup, 1).otherwise(0)).cast("long").alias("n_segments"),
        F.sum(F.when(kept, 0).otherwise(1)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                # collect_list drops the NULLs the when() leaves for removed
                # segments; array_sort on (pos, seg) structs restores order
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("_pos"), F.col("_seg")))
                    )
                ),
                lambda s: s["_seg"],
            ),
            joiner,
        ).alias("_clean"),
    )
    t = F.col(text_col)
    return docs.select(id_col, text_col).join(agg, on=id_col, how="left").select(
        F.col(id_col),
        F.when(t.isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("_clean"), F.lit("")))
        .alias("clean_text"),
        F.coalesce(F.col("n_segments"), F.lit(0).cast("long")).alias("n_segments"),
        F.coalesce(F.col("n_removed"), F.lit(0).cast("long")).alias("n_removed"),
    )


def dedup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
    keep: str = "first",
) -> DataFrame:
    """Corpus-level removal of repeated ``span_words``-word spans (C4-style).

    Documents are segmented into NON-overlapping word windows (the last
    window may be shorter); any window whose exact text occurs more than
    once in the corpus is dropped from every document except (with
    ``keep="first"``) the occurrence with the smallest (id, position).
    Returns (id, clean_text, n_segments, n_removed); ``clean_text`` is the
    retained spans rejoined by single spaces — whitespace inside the text is
    normalized by construction, which is what every downstream tokenizer in
    this engine does anyway. NULL text stays NULL; wordless text becomes ''.
    """
    if span_words < 1:
        raise ValueError("span_words must be >= 1")
    t = F.col(text_col)
    words = _words(t)
    n = F.size(words)
    starts = F.when(
        n >= 1, F.sequence(F.lit(1), n, F.lit(span_words))
    ).otherwise(F.array().cast("array<int>"))
    segments = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts, lambda i: F.array_join(F.slice(words, i, span_words), " ")
            )
        ).alias("_pos", "_seg"),
    )
    return _dedup_segments(docs, segments, id_col, text_col, " ", keep)


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "first",
    line_delim: str = "\n",
) -> DataFrame:
    """Corpus-level exact line dedup (RefinedWeb-style).

    Splits each document on ``line_delim``, drops every line whose exact
    text occurs more than once in the corpus (``keep="unique"``) or keeps
    only the first occurrence (``keep="first"``, default). Blank /
    whitespace-only lines are structural, not content — they are always
    retained. Returns (id, clean_text, n_segments, n_removed) where
    n_segments counts only the non-blank lines that took part in dedup.
    """
    t = F.col(text_col)
    delim_pat = "".join(_escape_regex_char(c) for c in line_delim)
    segments = docs.select(
        F.col(id_col),
        F.posexplode(F.split(t, delim_pat)).alias("_pos", "_seg"),
    ).withColumn("_blank", F.trim(F.col("_seg")) == "")
    return _dedup_segments(
        docs, segments, id_col, text_col, line_delim, keep, force_col="_blank"
    )


def dedup_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 10,
    keep: str = "first",
) -> DataFrame:
    """Cross-document exact substring dedup at ARBITRARY offsets (the
    "Deduplicating Training Data Makes Language Models Better" operation,
    Lee et al. 2022): remove every word that lies inside a duplicated run of
    at least ``min_words`` consecutive words, anywhere in the corpus.

    ``dedup_spans`` only catches duplicates that land on its non-overlapping
    window grid; this operator slides a stride-1 window, so a duplicated
    substring is detected at ANY alignment: a duplicated run of M >=
    ``min_words`` words produces M-min_words+1 duplicated windows that
    together cover all M words, and nothing outside the run is covered.

    Semantics (exactly reproducible in ANSI SQL — driver oracle
    ``substring_dedup_docs``): a window occurrence is *duplicate* iff its
    text occurs >= 2 times corpus-wide and (with ``keep="first"``) it is not
    the globally first occurrence (min (id, start)); a word position is
    removed iff ANY duplicate occurrence covers it. ``keep="unique"`` drops
    all copies. Note ``keep="first"`` guarantees one surviving copy of each
    duplicated *window*, not of each maximal run: a word inside the first
    occurrence of window A is still removed when a different, overlapping
    duplicated window B covers it — the same edge behavior as the
    reference suffix-array formulation. Returns (id, clean_text, n_words,
    n_removed); NULL text stays NULL; rebuilt text is space-joined (the
    same whitespace normalization as ``dedup_spans``).

    Scale shape (the suffix-array alternative is single-node; this is the
    shuffle-native equivalent): window hashes are computed INSIDE the
    per-row array (slice-before-explode), so the word array is never
    replicated per window and the exploded stream is O(total words) rows of
    (id, start, md5) — O(n*min_words) bytes read per document to hash, one
    partial-aggregated GROUP BY md5 for counts + first occurrence, one
    1:1-per-occurrence rejoin (output proportional to input, so AQE's
    skew-join split handles a Zipf-head boilerplate window), one bounded
    explode (exactly min_words positions per duplicate occurrence) and two
    id-keyed aggregates for the rebuild. Nothing collects to the driver.
    """
    if min_words < 1:
        raise ValueError("min_words must be >= 1")
    if keep not in ("first", "unique"):
        raise ValueError("keep must be 'first' or 'unique'")
    ln = int(min_words)
    t = F.col(text_col)
    base = docs.select(
        F.col(id_col),
        _words(t).alias("_w"),
        F.when(t.isNull(), F.lit(None).cast("long"))
        .otherwise(F.size(_words(t)).cast("long"))
        .alias("_n"),
    )
    # md5 of each stride-1 window, computed inside the array so the explode
    # carries only (id, start, 32-byte hash)
    starts = F.when(
        F.size("_w") >= ln, F.sequence(F.lit(1), F.size("_w") - ln + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts, lambda s: F.md5(F.array_join(F.slice(F.col("_w"), s, ln), " "))
    )
    occ = base.select(F.col(id_col), F.posexplode(grams).alias("_i", "_h")).select(
        F.col(id_col), (F.col("_i") + 1).alias("_s"), "_h"
    )
    summary = occ.groupBy("_h").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct(F.col(id_col).alias("i"), F.col("_s").alias("p"))).alias(
            "_first"
        ),
    )
    dup = occ.join(summary, "_h").where(F.col("_cnt") >= 2)
    if keep == "first":
        dup = dup.where(
            ~((F.col("_first.i") == F.col(id_col)) & (F.col("_first.p") == F.col("_s")))
        )
    covered = dup.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("_s"), F.col("_s") + ln - 1)).alias("_pos"),
    ).distinct()
    wstream = base.select(
        F.col(id_col), F.posexplode("_w").alias("_i", "_word")
    ).select(F.col(id_col), (F.col("_i") + 1).alias("_pos"), "_word")
    kept = wstream.join(covered, [id_col, "_pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_word"))),
                lambda s: s["_word"],
            ),
            " ",
        ).alias("_clean")
    )
    removed = covered.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_removed")
    )
    return (
        base.select(id_col, "_n")
        .join(rebuilt, id_col, "left")
        .join(removed, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_n").isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("_clean"), F.lit("")))
            .alias("clean_text"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def gopher_quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.3,
    max_dup_ngram_frac: float = 0.3,
    max_top_ngram_frac: float = 0.2,
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style document quality gate: composes the repetition signals
    with word-count / word-length rules into one keep/drop decision.

    Returns (id, n_words, mean_word_len, keep, reason) where ``reason`` is
    the FIRST failed rule in a fixed order (null_text, too_few_words,
    too_many_words, mean_word_len_low, mean_word_len_high, dup_line_frac,
    dup_line_char_frac, dup_ngram_frac, top_ngram_frac) and NULL when the
    document passes — per-rule attribution is what makes a corpus filter
    debuggable at scale (you audit WHY mass disappeared, per rule).

    Thresholds default to the published Gopher rules' shape; tune per
    corpus. Cost: the repetition-stats aggregate (one skew-safe shuffle);
    the word rules are per-row expressions. ``keep == reason IS NULL``.
    """
    t = F.col(text_col)
    words = _words(t)
    n_words = F.when(t.isNull(), F.lit(None).cast("long")).otherwise(
        F.size(words).cast("long")
    )
    mean_wl = F.when(t.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(
            F.size(words) > 0,
            _sum_lengths(words).cast("double") / F.size(words).cast("double"),
        ).otherwise(F.lit(0.0))
    )
    base = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("_mean_wl"),
        t.isNull().alias("_txt_null"),
    )
    stats = repetition_stats(docs, id_col, text_col, ngram_n=ngram_n)
    j = base.join(stats, on=id_col)
    reason = (
        F.when(F.col("_txt_null"), F.lit("null_text"))
        .when(F.col("n_words") < min_words, F.lit("too_few_words"))
        .when(F.col("n_words") > max_words, F.lit("too_many_words"))
        .when(F.col("_mean_wl") < min_mean_word_len, F.lit("mean_word_len_low"))
        .when(F.col("_mean_wl") > max_mean_word_len, F.lit("mean_word_len_high"))
        .when(F.col("dup_line_frac") > max_dup_line_frac, F.lit("dup_line_frac"))
        .when(
            F.col("dup_line_char_frac") > max_dup_line_char_frac,
            F.lit("dup_line_char_frac"),
        )
        .when(F.col("dup_ngram_frac") > max_dup_ngram_frac, F.lit("dup_ngram_frac"))
        .when(F.col("top_ngram_frac") > max_top_ngram_frac, F.lit("top_ngram_frac"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        F.col(id_col),
        "n_words",
        F.round(F.col("_mean_wl"), 6).alias("mean_word_len"),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


__all__ = [
    "repetition_stats",
    "dedup_spans",
    "dedup_lines",
    "dedup_substrings",
    "gopher_quality_filter",
]


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_pages: int = 5,
    line_delim: str = "\n",
) -> DataFrame:
    """Site-level boilerplate removal (CCNet / trafilatura-style).

    A line that appears on at least ``min_pages`` DISTINCT pages of the
    same ``group_col`` (site / host / crawl source) is navigation, footer
    or legal boilerplate, not content — ALL its occurrences in that group
    are removed (unlike :func:`dedup_lines`, which keeps a first
    occurrence: a "subscribe to our newsletter" line has no canonical
    page). Blank / whitespace-only lines are structural and always
    retained; documents with a NULL group never match any boilerplate set
    (equality join semantics) and pass through unchanged.

    Returns ``(id_col, group_col, clean_text, n_lines, n_removed)`` with
    ``n_lines`` counting only the non-blank lines that took part in
    detection; NULL text stays NULL.

    Scale shape: one posexplode, one distinct on (group, line-hash, page)
    — the shuffle key is the 32-hex line hash, so hot boilerplate lines
    partial-aggregate map-side — one (group, hash)-keyed count, and one
    join back on (group, hash). The boilerplate table is usually tiny
    (the HAVING prunes everything organic), so AQE broadcasts the join
    side; nothing is collected. Grouping by site bounds the count key
    space no matter how big the crawl.
    """
    t = F.col(text_col)
    delim_pat = "".join(_escape_regex_char(c) for c in line_delim)
    seg = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(F.split(t, delim_pat)).alias("_pos", "_seg"),
    ).withColumn("_blank", F.trim(F.col("_seg")) == "").withColumn(
        "_h", F.md5(F.col("_seg"))
    )
    pages = (
        seg.where(~F.col("_blank"))
        .select(group_col, "_h", id_col)
        .distinct()
        .groupBy(group_col, "_h")
        .agg(F.count(F.lit(1)).alias("_pages"))
    )
    boiler = pages.where(F.col("_pages") >= int(min_pages)).select(
        F.col(group_col), F.col("_h"), F.lit(True).alias("_bp")
    )
    marked = seg.join(boiler, [group_col, "_h"], "left")
    kept = F.col("_blank") | F.col("_bp").isNull()
    agg = marked.groupBy(id_col).agg(
        F.sum(F.when(~F.col("_blank"), 1).otherwise(0)).cast("long").alias("n_lines"),
        F.sum(F.when(kept, 0).otherwise(1)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("_pos"), F.col("_seg")))
                    )
                ),
                lambda s: s["_seg"],
            ),
            line_delim,
        ).alias("_clean"),
    )
    return docs.select(id_col, group_col, text_col).join(
        agg, on=id_col, how="left"
    ).select(
        F.col(id_col),
        F.col(group_col),
        F.when(t.isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("_clean"), F.lit("")))
        .alias("clean_text"),
        F.coalesce(F.col("n_lines"), F.lit(0).cast("long")).alias("n_lines"),
        F.coalesce(F.col("n_removed"), F.lit(0).cast("long")).alias("n_removed"),
    )
