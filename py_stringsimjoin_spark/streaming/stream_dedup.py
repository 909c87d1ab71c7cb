"""Streaming MinHash-LSH near-duplicate detection against a static corpus.

The batch dedup suite (operators/dedup.py) finds near-dups WITHIN a corpus;
a continuously-crawled pages stream needs the incremental question instead:
"is this new page a near-duplicate of anything already in the corpus?" —
answered per micro-batch, without re-scanning the corpus.

Plan shape (all JVM expressions, streaming-legal):

* static side, once: corpus → shingle → flat explode+agg MinHash signature
  → LSH band buckets (``build_static_lsh_index``) — the exact batch plan,
  persisted, reused by every micro-batch;
* stream side, per micro-batch: per-ROW signature via array expressions
  (``minhash_perm_cols`` — no aggregation, so it is valid in append-mode
  streaming; micro-batches are small, so the interpreted-per-element HOF
  cost the batch plan avoids is irrelevant here) → the SAME band-bucket
  hash (``band_bucket_exprs`` is shared, so stream rows land in exactly
  the buckets their batch twins would) → stream-static equi-join on
  (band, bucket) → exact shingle-Jaccard verify against the corpus text.

The reference is strictly batch (SURVEY.md §2.5); this is the streaming
analogue of its candidate-generation + verify split, re-expressed for
Structured Streaming. At cluster scale the static band index is a few
hundred bytes per corpus document — shuffle-partitioned by bucket; the
stream side joins against it with no state store (stream-static joins are
stateless by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizers import ShingleTokenizer, Tokenizer
from ..operators.dedup import (
    band_bucket_exprs,
    minhash_lsh_pairs,  # noqa: F401 — batch twin, for API discoverability
    minhash_perm_cols,
)
from ..plans.cache import tracked_cache as _tc


def _tokens(df: DataFrame, id_col: str, text_col: str, tok: Tokenizer, side: str):
    return (
        df.select(F.col(id_col).alias(f"_{side}_key"), F.col(text_col).alias("_t"))
        .where(F.col("_t").isNotNull())
        .withColumn(f"_{side}_tokens", tok.spark_col(F.col("_t")))
        .where(F.size(f"_{side}_tokens") > 0)
        .drop("_t")
    )


def build_static_lsh_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    tokenizer: Tokenizer | None = None,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(corpus key, _band, _bucket) rows for the static corpus, persisted.

    Uses the batch flat explode+agg signature plan (one hash-aggregate with
    ``num_perm`` codegen'd MIN columns) — compute once, probe per batch."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    tok = tokenizer or ShingleTokenizer(n=3)
    from ..operators.dedup import MINHASH_MERSENNE, _token_hash_col, minhash_perm_params

    base = _tokens(corpus, id_col, text_col, tok, "r")
    rows = base.select(
        "_r_key", F.explode("_r_tokens").alias("_tok")
    ).select("_r_key", _token_hash_col(F.col("_tok")).alias("_h"))
    sig = rows.groupBy("_r_key").agg(
        *[
            F.min((F.col("_h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_MERSENNE)).alias(f"_s{i}")
            for i, (a, b) in enumerate(minhash_perm_params(num_perm))
        ]
    )
    buckets = band_bucket_exprs([F.col(f"_s{i}") for i in range(num_perm)], bands)
    idx = sig.select(
        "_r_key", F.posexplode(F.array(*buckets)).alias("_band", "_bucket")
    )
    return idx.persist().transform(_tc)


def stream_neardup_candidates(
    stream: DataFrame,
    static_index: DataFrame,
    id_col: str,
    text_col: str,
    tokenizer: Tokenizer | None = None,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """streaming docs → candidate (stream key, corpus key) pairs sharing ≥1
    LSH band bucket with the static corpus."""
    tok = tokenizer or ShingleTokenizer(n=3)
    s = _tokens(stream, id_col, text_col, tok, "l")
    buckets = band_bucket_exprs(minhash_perm_cols(F.col("_l_tokens"), num_perm), bands)
    probe = s.select(
        "_l_key", F.posexplode(F.array(*buckets)).alias("_band", "_bucket")
    )
    return (
        probe.join(static_index, ["_band", "_bucket"])
        .select("_l_key", "_r_key")
        .dropDuplicates(["_l_key", "_r_key"])
    )


def stream_neardup_matches(
    stream: DataFrame,
    corpus: DataFrame,
    static_index: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    tokenizer: Tokenizer | None = None,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Verified near-dup matches (stream key, corpus key, jaccard ≥ t) for a
    doc stream against a static corpus — LSH candidates re-verified with
    exact shingle Jaccard as JVM array arithmetic per candidate row."""
    tok = tokenizer or ShingleTokenizer(n=3)
    cand = stream_neardup_candidates(
        stream, static_index, id_col, text_col, tok, num_perm, bands
    )
    s_tok = _tokens(stream, id_col, text_col, tok, "l").withColumn(
        "_lt", F.array_distinct("_l_tokens")
    ).select("_l_key", "_lt")
    c_tok = _tokens(corpus, id_col, text_col, tok, "r").withColumn(
        "_rt", F.array_distinct("_r_tokens")
    ).select("_r_key", "_rt")
    j = (
        cand.join(s_tok, "_l_key")
        .join(c_tok, "_r_key")
        .withColumn("_ov", F.size(F.array_intersect("_lt", "_rt")).cast("double"))
        .withColumn(
            "_sim_score",
            F.col("_ov")
            / (F.size("_lt").cast("double") + F.size("_rt").cast("double") - F.col("_ov")),
        )
    )
    return (
        j.where(F.col("_sim_score") >= threshold)
        .select("_l_key", "_r_key", "_sim_score")
    )
