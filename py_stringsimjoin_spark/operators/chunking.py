"""Document chunking: split each document into fixed-token-budget training
chunks with overlap — the tokenize-and-window step every LLM data pipeline
runs between curation and sequence packing.

Beyond-reference operator (the reference has no document model; tokenizer
conventions follow its whitespace semantics,
/root/reference/py_stringsimjoin/tests/test_join.py:20-40). Chunks step by
``chunk_tokens − overlap_tokens`` so consecutive chunks share exactly
``overlap_tokens`` words (context continuity across chunk boundaries); the
final chunk is the remainder tail (shorter, never empty, never duplicated:
a doc of ≤ chunk_tokens words is one chunk, and a step that would start at
or past the end emits nothing).

    starts(n) = 0, s, 2s, ...   while start < n,  s = chunk − overlap
    BUT a start whose window would be fully contained in the previous one
    (start + chunk ≤ n is false AND previous window already reached n)
    still emits — it is the remainder tail; dedup of an exact-suffix tail
    is the caller's choice via ``drop_contained_tail``.

Scale shape (100 TB test): map-only — one tokenize + one JVM
``sequence``/``transform`` per row, exploded to chunk rows; zero shuffles,
zero Python, trivially partition-parallel, so it composes as a free
pre-stage of any downstream shuffle (dedup, splits, packing). Chunk ids
are (doc, index) pairs, deterministic under reruns and repartitioning.
Whitespace runs collapse to single spaces in chunk text (chunks are
``array_join``\\ ed token windows — the normalization a tokenizer-bound
consumer expects); char offsets are intentionally NOT emitted for this
reason. All string ops — identical across engines, driver-oracle-able
with no float tricks at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr, validate_attr_type


def chunk_documents(
    df: DataFrame,
    id_attr: str,
    text_attr: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    drop_contained_tail: bool = True,
) -> DataFrame:
    """(id, chunk_index, chunk_text, n_tokens) — whitespace-token windows
    of ``chunk_tokens`` words stepping by ``chunk_tokens − overlap_tokens``.
    NULL/empty documents emit no chunks. ``drop_contained_tail=True`` (the
    default) suppresses a final short chunk whose tokens are all already
    inside the previous chunk's window (it carries no new content)."""
    validate_attr(df, id_attr, "input")
    validate_attr(df, text_attr, "input")
    validate_attr_type(df, text_attr, "input")
    if not (chunk_tokens >= 1):
        raise AssertionError("chunk_tokens must be >= 1")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise AssertionError("require 0 <= overlap_tokens < chunk_tokens")
    step = chunk_tokens - overlap_tokens

    toks = F.filter(F.split(F.trim(F.col(text_attr)), r"\s+"), lambda t: t != "")
    base = (
        df.where(F.col(text_attr).isNotNull())
        .select(F.col(id_attr), toks.alias("_toks"))
        .where(F.size("_toks") > 0)
        .withColumn("_n", F.size("_toks"))
    )
    # start offsets 0, step, 2*step, ... < n  (1-based slice positions below)
    starts = F.sequence(
        F.lit(0),
        F.col("_n") - F.lit(1),
        F.lit(step),
    )
    if drop_contained_tail:
        # keep a start only if its window reaches past the previous window's
        # end, i.e. start + chunk > prev_start + chunk  ⇔ always true for
        # distinct starts — containment only happens when the window ends at
        # n for BOTH: start >= n - chunk means this window's END is n; the
        # previous window also ended at n iff start - step + chunk >= n.
        starts = F.filter(
            starts,
            lambda s: ~(
                (s > 0)
                & (s - F.lit(step) + F.lit(chunk_tokens) >= F.col("_n"))
            ),
        )
    exploded = base.select(
        id_attr,
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_index", "_start"),
    )
    window = F.slice(F.col("_toks"), F.col("_start") + 1, F.lit(chunk_tokens))
    return exploded.select(
        id_attr,
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.array_join(window, " ").alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("_start")
        ).cast("long").alias("n_tokens"),
    )
