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
    # Per-document array formulation (round-6 optimization): the previous
    # plan exploded every k-gram into its ≤w windows (a ×w row blow-up) and
    # selected each window's min with a corpus-wide hash aggregation + a
    # final distinct — two shuffles and ~w× the rows, all to compute a
    # quantity that is LOCAL to one document. Instead build the packed
    # (hash, 10^9−pos) key array once per doc, take each window's min with
    # slice + array_min inside a single projection (window wi covers k-gram
    # positions wi..wi+w−1, exactly the old explode range transposed; the
    # tail window's slice is naturally shorter, and the single-window short-
    # doc case is slice(keys, 1, w) over all ng elements), and dedupe
    # adjacent windows' repeated picks with array_distinct — which is
    # precisely what the old corpus-wide ``distinct()`` removed, since
    # (id, pos, fp) duplicates can only come from the same document. The
    # result is the same fingerprint set from a map-only, zero-shuffle plan
    # (measured sf0.1 local[32]: 142 core-s / 2 shuffles → ~40 core-s / 0).
    keys = F.transform(
        F.sequence(F.lit(1), F.col("_ng")),
        lambda p: F.concat(
            F.substring(F.md5(F.col("_t").substr(p, F.lit(k))), 1, 16),
            F.lpad((F.lit(_POS_BASE) - p).cast("string"), 10, "0"),
        ),
    )
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("_nw")),
            lambda wi: F.array_min(F.slice(F.col("_keys"), wi, F.lit(w))),
        )
    )
    sel = base.withColumn("_keys", keys).select(
        "id", F.explode(wins).alias("_key")
    )
    return sel.select(
        "id",
        (F.lit(_POS_BASE) - F.substring("_key", 17, 10).cast("long")).alias("pos"),
        F.substring("_key", 1, 16).alias("fp"),
    )


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
