"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
the MOSS algorithm).

Hash every character k-gram, slide a window of ``w`` consecutive hashes,
and record each window's minimum (rightmost position on ties). The
guarantee: any substring match of length ≥ k + w − 1 between two documents
shares at least one selected fingerprint, while only ~2/(w+1) of positions
are kept — the classic local, position-robust alternative to minhash for
plagiarism / near-dup / overlap detection at corpus scale. The reference
engine has no fingerprinting surface (SURVEY.md §2.5); the repo's
``textstats.doc_fingerprints`` is a fixed-stride rolling hash — winnowing
adds the content-defined selection that survives insertions/deletions.

Scale shape (100 TB test): map-only k-gram hashing (one JVM ``transform``
over a position sequence — no explode of raw text bytes beyond the k-gram
rows), a bounded w-way window-start explode, and ONE partial-aggregated
hash aggregation keyed (doc, window) followed by a distinct — no windows-
over-sort, no Python, no driver state. Output is ~2·n/(w+1) fingerprint
rows per n-char doc. Matching docs then meet on the fp key with a plain
equi-join (``fingerprint_matches``), candidates ≪ n² exactly as in the
set-sim prefix filter.

Determinism / oracle form: the hash is the first 16 hex chars of
md5(k-gram) — an ASCII string whose lexicographic order both engines
compare identically (the splits.py draw idiom), so "window minimum" needs
no numeric conversion anywhere. The rightmost-tie rule packs
(hash, 10^9 − pos) into one fixed-width string and takes ``min``: the
per-window argmin is ONE aggregate both engines evaluate bit-identically.
Docs with fewer than ``w`` k-grams form a single window (every doc with
≥ k chars yields ≥ 1 fingerprint); shorter docs yield none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr, validate_attr_type

_POS_BASE = 1_000_000_000  # > any document length; keeps the packed key fixed-width


def winnow_fingerprints(
    df: DataFrame,
    id_attr: str,
    text_attr: str,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """(id, pos, fp): the winnowing fingerprint set of every document —
    ``pos`` is the 1-based character position of the selected k-gram,
    ``fp`` its 16-hex-char hash. ``k`` = noise threshold (matches shorter
    than k never fingerprint), ``k + w − 1`` = guarantee threshold (matches
    at least that long always share a fingerprint)."""
    validate_attr(df, id_attr, "df")
    validate_attr(df, text_attr, "df")
    validate_attr_type(df, text_attr, "df")
    if not (k >= 1 and w >= 1):
        raise AssertionError("require k >= 1 and w >= 1")

    from ..plans.layout import widen_small_scan

    ng = F.char_length(F.col("_t")) - F.lit(k) + F.lit(1)
    # The k-gram hashing is the HEAVY map work and it runs BEFORE any
    # shuffle, so it is bound by the SCAN's parallelism — on a small-file
    # corpus (one 128 MB-default split) that serializes the whole
    # fingerprint pass onto one task (measured: 17.9 s -> 4 s at sf0.1
    # local[32]). plans/layout.widen_small_scan widens only when the scan
    # is narrower than the session's shuffle parallelism; at production
    # scale file splits already provide it and this is a no-op.
    src = widen_small_scan(
        df.select(F.col(id_attr).alias("id"), F.col(text_attr).alias("_t"))
    )
    base = (
        src.where(F.col("_t").isNotNull() & (F.char_length(F.col("_t")) >= k))
        .withColumn("_ng", ng)
        # one window when the doc has fewer than w k-grams
        .withColumn("_nw", F.greatest(F.lit(1), F.col("_ng") - F.lit(w) + F.lit(1)))
    )
    kg = base.select(
        "id",
        "_nw",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("_ng")),
                lambda p: F.substring(F.md5(F.col("_t").substr(p, F.lit(k))), 1, 16),
            )
        ).alias("_p0", "_h"),
    ).select(
        "id",
        "_nw",
        (F.col("_p0") + 1).alias("_p"),  # 1-based k-gram position
        "_h",
    )
    # k-gram at position p participates in window starts
    # max(1, p-w+1) .. min(p, n_windows)
    ws = kg.select(
        "id",
        "_p",
        "_h",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.col("_p") - F.lit(w) + F.lit(1)),
                F.least(F.col("_p"), F.col("_nw")),
            )
        ).alias("_w"),
    )
    # fixed-width packed key: min() picks (min hash, then max pos = rightmost)
    key = F.concat(
        F.col("_h"),
        F.lpad((F.lit(_POS_BASE) - F.col("_p")).cast("string"), 10, "0"),
    )
    sel = ws.groupBy("id", "_w").agg(F.min(key).alias("_key"))
    return sel.select(
        "id",
        (F.lit(_POS_BASE) - F.substring("_key", 17, 10).cast("long")).alias("pos"),
        F.substring("_key", 1, 16).alias("fp"),
    ).distinct()


def fingerprint_matches(
    df: DataFrame,
    id_attr: str,
    text_attr: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """(l_id, r_id, shared_fps): document pairs sharing ≥ ``min_shared``
    winnowing fingerprints — the equi-join-on-fp candidate generator (any
    common substring of length ≥ k + w − 1 guarantees a hit)."""
    if not (min_shared >= 1):
        raise AssertionError("min_shared must be >= 1")
    fps = winnow_fingerprints(df, id_attr, text_attr, k, w)
    l = fps.select(F.col("id").alias("l_id"), "fp").distinct()
    r = fps.select(F.col("id").alias("r_id"), "fp").distinct()
    return (
        l.join(r, "fp")
        .where(F.col("l_id") < F.col("r_id"))
        .groupBy("l_id", "r_id")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
