"""Structured-Streaming incremental similarity matching.

The reference is strictly batch (SURVEY.md §2.5 — no streaming). For a
continuously-crawled pages table, this module adds the streaming analogue of
the blocking stage: a ``readStream`` of new pages is tokenized, prefix-
exploded against a **static** indexed corpus (stream-static join — supported
without watermarks), candidates are verified in the same vectorized kernel,
and matches append to a sink. Token ordering comes from the static corpus
(new tokens fall back to rank = +inf bucket, i.e. they join nothing — they
can't match an indexed page on an unseen token anyway).

This is a deliberately thin layer: candidate generation + verification reuse
the batch operators' column logic, so semantics stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizers import Tokenizer
from ..operators.set_sim_join import as_set_tokenizer
from ..plans import filter_math as fm
from ..plans.cache import tracked_cache as _tc


def build_static_index(
    corpus: DataFrame,
    key_attr: str,
    join_attr: str,
    tokenizer: Tokenizer,
    measure: str,
    threshold: float,
):
    """Pre-rank the static corpus once; returns (ordering_df, prefix_df,
    tokens_df) to reuse across micro-batches."""
    from ..operators.token_ordering import add_ranked_tokens, build_token_ordering

    tok = as_set_tokenizer(tokenizer)
    base = (
        corpus.select(F.col(key_attr).alias("_r_key"), F.col(join_attr).alias("_s"))
        .where(F.col("_s").isNotNull())
        .withColumn("_tokens", tok.spark_col(F.col("_s")))
    )
    ordering = build_token_ordering([(base, "_tokens")]).persist().transform(_tc)
    ranked = add_ranked_tokens(base, ["_r_key"], "_tokens", ordering, "_ranked", "_size").persist().transform(_tc)
    prefix = (
        ranked.withColumn("_pfx", fm.prefix_length_col(F.col("_size"), measure, threshold))
        .select("_r_key", "_size", F.posexplode(F.expr("slice(_ranked, 1, _pfx)")).alias("_r_pos", "_tokid"))
        .join(ordering.select(F.col("rank").alias("_tokid"), "token"), "_tokid")
        .persist().transform(_tc)
    )
    return ordering, prefix, ranked


def stream_candidates(
    stream: DataFrame,
    static_prefix: DataFrame,
    key_attr: str,
    join_attr: str,
    tokenizer: Tokenizer,
    measure: str,
    threshold: float,
) -> DataFrame:
    """streaming pages → candidate (stream_key, corpus_key) pairs via
    stream-static equi-join on prefix tokens."""
    tok = as_set_tokenizer(tokenizer)
    s = (
        stream.select(F.col(key_attr).alias("_l_key"), F.col(join_attr).alias("_s"))
        .where(F.col("_s").isNotNull())
        .withColumn("_tokens", tok.spark_col(F.col("_s")))
        .withColumn("_l_size", F.size("_tokens"))
        .withColumn("_pfx", fm.prefix_length_col(F.col("_l_size"), measure, threshold))
        # ordering is unavailable for unseen stream rows; use the *full* token
        # set as the probe prefix (sound: a superset probe only adds candidates)
        .select("_l_key", "_l_size", F.explode("_tokens").alias("token"))
    )
    cand = s.join(static_prefix, "token").where(
        (F.col("_size") >= fm.size_lower_bound_col(F.col("_l_size"), measure, threshold))
        & (F.col("_size") <= fm.size_upper_bound_col(F.col("_l_size"), measure, threshold))
    )
    return cand.select("_l_key", F.col("_r_key"), "token").dropDuplicates(
        ["_l_key", "_r_key"]
    )


def stream_matches(
    stream: DataFrame,
    corpus: DataFrame,
    key_attr: str,
    join_attr: str,
    tokenizer: Tokenizer,
    measure: str,
    threshold: float,
    static_prefix: DataFrame,
) -> DataFrame:
    """Verified matches for a page stream against a static corpus.

    Candidates from ``stream_candidates`` are verified with exact set
    similarity computed as JVM array arithmetic per candidate row
    (array_intersect on the two token sets) — valid inside Structured
    Streaming (no mapInPandas state needed; each micro-batch is pure).
    Returns (stream key, corpus key, _sim_score).
    """
    tok = as_set_tokenizer(tokenizer)
    cand = stream_candidates(
        stream, static_prefix, key_attr, join_attr, tokenizer, measure, threshold
    ).select("_l_key", "_r_key")
    s_tok = stream.select(
        F.col(key_attr).alias("_l_key"), tok.spark_col(F.col(join_attr)).alias("_lt")
    )
    c_tok = corpus.select(
        F.col(key_attr).alias("_r_key"), tok.spark_col(F.col(join_attr)).alias("_rt")
    )
    j = (
        cand.join(s_tok, "_l_key")
        .join(c_tok, "_r_key")
        .withColumn("_ov", F.size(F.array_intersect("_lt", "_rt")).cast("double"))
        .withColumn("_ls", F.size("_lt").cast("double"))
        .withColumn("_rs", F.size("_rt").cast("double"))
    )
    if measure == "jaccard":
        score = F.col("_ov") / (F.col("_ls") + F.col("_rs") - F.col("_ov"))
    elif measure == "cosine":
        score = F.col("_ov") / F.sqrt(F.col("_ls") * F.col("_rs"))
    elif measure == "dice":
        score = F.lit(2.0) * F.col("_ov") / (F.col("_ls") + F.col("_rs"))
    else:
        raise ValueError(measure)
    return (
        j.withColumn("_sim_score", score)
        .where(F.col("_sim_score") >= threshold)
        .select("_l_key", "_r_key", "_sim_score")
    )


def write_matches_stream(
    matches: DataFrame,
    path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    output_mode: str = "append",
    available_now: bool = False,
):
    """Start the verified-match sink: matches → append-only files with an
    exactly-once checkpoint (the streaming end of the readStream →
    stream_matches → writeStream pipeline). ``available_now=True`` drains
    what's currently available and stops (batch-style backfill trigger);
    the default runs continuously per micro-batch. Returns the
    StreamingQuery."""
    w = (
        matches.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def dedup_recrawls(
    stream: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-crawled duplicates of the same url within the watermark window
    (late data beyond the watermark is discarded by the engine) — the
    streaming-ingest hygiene step before candidate generation."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([url_col])


def windowed_match_counts(
    matches: DataFrame,
    ts_col: str,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
    key_col: str = "_l_key",
) -> DataFrame:
    """Event-time-windowed match metrics with late-data handling.

    The monitoring tail of the streaming pipeline: per event-time window,
    how many verified matches arrived and how many distinct stream pages
    produced them. ``withWatermark`` bounds the aggregation state — windows
    older than the watermark are finalized and dropped from the store, and
    records arriving later than that are discarded (the documented
    late-data contract). Tumbling windows by default; pass ``slide`` for
    sliding ones.

    Output: ``window_start, window_end, n_matches, n_src_pages``. Works on
    a streaming OR a batch DataFrame (the same expressions run in both —
    handy for backfilling the metric over historical match parquet).
    """
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    src = matches
    if matches.isStreaming:
        src = matches.withWatermark(ts_col, watermark)
    return (
        src.groupBy(win.alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.approx_count_distinct(key_col).alias("n_src_pages"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "n_matches",
            "n_src_pages",
        )
    )
