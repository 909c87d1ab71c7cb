"""Meta-blocking: weight the block graph, prune low-evidence candidate pairs.

Token blocking (every shared token is a block) is the standard
schema-agnostic recall net for dirty entity resolution, but it emits a
quadratic haystack; META-blocking (Papadakis et al., "Meta-Blocking:
Taking Entity Resolution to the Next Level", TKDE 2014 — public
literature) re-ranks the candidate pairs by how much BLOCK-LEVEL evidence
they share before any string comparison runs:

* an edge (u, v) exists when u and v co-occur in ≥1 surviving block;
* its weight is CBS (common-blocks count) or JS (Jaccard of the two
  records' block sets, ``cbs / (|B(u)| + |B(v)| - cbs)``);
* pruning keeps high-weight edges: WEP (weight-edge pruning — global
  threshold, defaulting to the mean edge weight) or CNP (cardinality-node
  pruning — each record keeps its top-k edges; an edge survives if EITHER
  endpoint keeps it).

The reference engine has no analogue — its filters (OverlapFilter et al.,
/root/reference/py_stringsimjoin/filter/overlap_filter.py) bound the
string-similarity measure itself; meta-blocking prunes on co-occurrence
structure and routinely cuts 90%+ of candidates before the measure is ever
computed, which is exactly the stage a 10^12-page linkage pipeline
needs between blocking and scoring.

Scale shape (all pure DataFrame ops — no UDF, nothing collected):

* block purging (``max_block_size``) is the skew control: it drops the
  Zipf-head stop-token blocks whose pair lists are quadratic in block
  size, bounding every block's contribution to the self-join — the
  standard web-scale prelude (a block of b rows emits b(b-1)/2 pairs;
  purging caps b). Singleton blocks are dropped too (no pairs).
* the pair generation is ONE shuffle equi-join on the block key; the CBS
  aggregation shuffles on the (l, r) pair — the same key every downstream
  scorer groups on anyway.
* node degrees ride a records-sized aggregation; the WEP mean threshold is
  a single-row aggregate broadcast back (no collect). CNP's top-k is a
  WindowGroupLimit per node — partial limits run map-side before the
  shuffle, so the window never materializes a node's full edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizers import Tokenizer
from ..plans.validation import validate_attr

_WEIGHTS = ("cbs", "js")
_PRUNE = ("wep", "cnp", "none")


def token_blocks(
    df: DataFrame,
    key_attr: str,
    block_attr: str,
    tokenizer: Tokenizer,
    max_block_size: int | None = None,
) -> DataFrame:
    """Purged token-block assignments ``(_block, key_attr)``.

    One row per (surviving block, member record). Blocks of size 1 never
    produce a pair and are always dropped; blocks larger than
    ``max_block_size`` are purged (stop-token skew control).
    """
    validate_attr(df, key_attr, "token_blocks input")
    validate_attr(df, block_attr, "token_blocks input")
    toks = tokenizer.spark_col(F.col(block_attr))
    blocks = df.select(
        F.col(key_attr), F.explode(F.array_distinct(toks)).alias("_block")
    )
    sizes = blocks.groupBy("_block").agg(F.count(F.lit(1)).alias("_bsz"))
    keep = F.col("_bsz") >= 2
    if max_block_size is not None:
        if max_block_size < 2:
            raise AssertionError("max_block_size must be >= 2")
        keep = keep & (F.col("_bsz") <= max_block_size)
    return blocks.join(sizes.where(keep).select("_block"), "_block").select(
        "_block", key_attr
    )


def metablock_pairs(
    df: DataFrame,
    key_attr: str,
    block_attr: str,
    tokenizer: Tokenizer,
    weight: str = "js",
    prune: str = "wep",
    threshold: float | None = None,
    k: int | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Weighted + pruned candidate pairs over the token-block graph.

    Returns ``(l_<key_attr>, r_<key_attr>, common_blocks, weight)`` with
    ``l < r`` (dirty-ER self linkage — one collection, unordered pairs).

    ``weight``: ``'cbs'`` (common-block count, as double) or ``'js'``
    (block-set Jaccard). ``prune``: ``'wep'`` keeps ``weight >=
    threshold`` (``threshold=None`` → the mean edge weight, computed
    distributed and broadcast back — note the mean's float sum order is
    engine-dependent, so exact-replay oracles should pass an explicit
    threshold); ``'cnp'`` keeps an edge iff it ranks in the top-``k`` of
    either endpoint (ties broken by the partner key ascending —
    deterministic); ``'none'`` returns all weighted edges.
    """
    if weight not in _WEIGHTS:
        raise AssertionError(f"weight must be one of {_WEIGHTS}, got {weight!r}")
    if prune not in _PRUNE:
        raise AssertionError(f"prune must be one of {_PRUNE}, got {prune!r}")
    if prune == "cnp" and (k is None or k < 1):
        raise AssertionError("prune='cnp' requires k >= 1")

    blocks = token_blocks(df, key_attr, block_attr, tokenizer, max_block_size)
    l = blocks.select(F.col("_block"), F.col(key_attr).alias("_l"))
    r = blocks.select(F.col("_block"), F.col(key_attr).alias("_r"))
    edges = (
        l.join(r, "_block")
        .where(F.col("_l") < F.col("_r"))
        .groupBy("_l", "_r")
        .agg(F.count(F.lit(1)).alias("common_blocks"))
    )
    if weight == "js":
        deg = blocks.groupBy(key_attr).agg(F.count(F.lit(1)).alias("_nb"))
        edges = (
            edges.join(deg.select(F.col(key_attr).alias("_l"), F.col("_nb").alias("_nbl")), "_l")
            .join(deg.select(F.col(key_attr).alias("_r"), F.col("_nb").alias("_nbr")), "_r")
            .select(
                "_l",
                "_r",
                "common_blocks",
                (
                    F.col("common_blocks").cast("double")
                    / (F.col("_nbl") + F.col("_nbr") - F.col("common_blocks")).cast(
                        "double"
                    )
                ).alias("weight"),
            )
        )
    else:
        edges = edges.select(
            "_l", "_r", "common_blocks", F.col("common_blocks").cast("double").alias("weight")
        )

    if prune == "wep":
        if threshold is None:
            mean = edges.agg(F.avg("weight").alias("_mw"))
            edges = edges.crossJoin(F.broadcast(mean)).where(
                F.col("weight") >= F.col("_mw")
            ).drop("_mw")
        else:
            edges = edges.where(F.col("weight") >= F.lit(float(threshold)))
    elif prune == "cnp":
        directed = edges.select(
            F.col("_l").alias("_node"), F.col("_r").alias("_other"), "_l", "_r", "weight"
        ).unionByName(
            edges.select(
                F.col("_r").alias("_node"), F.col("_l").alias("_other"), "_l", "_r", "weight"
            )
        )
        w = Window.partitionBy("_node").orderBy(
            F.col("weight").desc(), F.col("_other").asc()
        )
        kept = (
            directed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(k))
            .select("_l", "_r")
            .distinct()
        )
        edges = edges.join(kept, ["_l", "_r"])

    return edges.select(
        F.col("_l").alias(f"l_{key_attr}"),
        F.col("_r").alias(f"r_{key_attr}"),
        "common_blocks",
        "weight",
    )


def metablock_pairs_two_tables(
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_block_attr: str,
    r_block_attr: str,
    tokenizer: Tokenizer,
    weight: str = "js",
    prune: str = "wep",
    threshold: float | None = None,
    k: int | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Clean-clean (R≠S) meta-blocking: edges only ACROSS the two
    collections.

    Same weighting/pruning semantics as :func:`metablock_pairs`, adapted
    to two deduplicated collections (Papadakis' clean-clean ER setting):
    a block is the set of records from BOTH sides sharing a token; blocks
    whose size (l-members + r-members) exceeds ``max_block_size`` are
    purged, as are blocks missing either side (they yield no cross
    pairs); degrees |B(u)| count each record's surviving blocks on its own
    side. CNP ranks a node's CROSS edges only (there are no within-side
    edges to rank). Output: ``(l_<l_key_attr>, r_<r_key_attr>,
    common_blocks, weight)``.
    """
    if weight not in _WEIGHTS:
        raise AssertionError(f"weight must be one of {_WEIGHTS}, got {weight!r}")
    if prune not in _PRUNE:
        raise AssertionError(f"prune must be one of {_PRUNE}, got {prune!r}")
    if prune == "cnp" and (k is None or k < 1):
        raise AssertionError("prune='cnp' requires k >= 1")

    def _blocks(df, key, attr):
        validate_attr(df, key, "metablock input")
        validate_attr(df, attr, "metablock input")
        toks = tokenizer.spark_col(F.col(attr))
        return df.select(
            F.col(key), F.explode(F.array_distinct(toks)).alias("_block")
        )

    lb = _blocks(ltable, l_key_attr, l_block_attr).select(
        "_block", F.col(l_key_attr).alias("_l")
    )
    rb = _blocks(rtable, r_key_attr, r_block_attr).select(
        "_block", F.col(r_key_attr).alias("_r")
    )
    sizes = (
        lb.select("_block").withColumn("_side", F.lit("l"))
        .unionByName(rb.select("_block").withColumn("_side", F.lit("r")))
        .groupBy("_block")
        .agg(
            F.count(F.lit(1)).alias("_bsz"),
            F.count_distinct("_side").alias("_sides"),
        )
    )
    keep = F.col("_sides") == 2
    if max_block_size is not None:
        if max_block_size < 2:
            raise AssertionError("max_block_size must be >= 2")
        keep = keep & (F.col("_bsz") <= max_block_size)
    good = sizes.where(keep).select("_block")
    lbp = lb.join(good, "_block")
    rbp = rb.join(good, "_block")
    edges = (
        lbp.join(rbp, "_block")
        .groupBy("_l", "_r")
        .agg(F.count(F.lit(1)).alias("common_blocks"))
    )
    if weight == "js":
        ldeg = lbp.groupBy("_l").agg(F.count(F.lit(1)).alias("_nbl"))
        rdeg = rbp.groupBy("_r").agg(F.count(F.lit(1)).alias("_nbr"))
        edges = (
            edges.join(ldeg, "_l").join(rdeg, "_r").select(
                "_l", "_r", "common_blocks",
                (
                    F.col("common_blocks").cast("double")
                    / (F.col("_nbl") + F.col("_nbr") - F.col("common_blocks")).cast(
                        "double"
                    )
                ).alias("weight"),
            )
        )
    else:
        edges = edges.select(
            "_l", "_r", "common_blocks",
            F.col("common_blocks").cast("double").alias("weight"),
        )

    if prune == "wep":
        if threshold is None:
            mean = edges.agg(F.avg("weight").alias("_mw"))
            edges = edges.crossJoin(F.broadcast(mean)).where(
                F.col("weight") >= F.col("_mw")
            ).drop("_mw")
        else:
            edges = edges.where(F.col("weight") >= F.lit(float(threshold)))
    elif prune == "cnp":
        w_l = Window.partitionBy("_l").orderBy(F.col("weight").desc(), F.col("_r").asc())
        w_r = Window.partitionBy("_r").orderBy(F.col("weight").desc(), F.col("_l").asc())
        ranked = edges.withColumn("_rnl", F.row_number().over(w_l)).withColumn(
            "_rnr", F.row_number().over(w_r)
        )
        edges = ranked.where(
            (F.col("_rnl") <= int(k)) | (F.col("_rnr") <= int(k))
        ).drop("_rnl", "_rnr")

    return edges.select(
        F.col("_l").alias(f"l_{l_key_attr}"),
        F.col("_r").alias(f"r_{r_key_attr}"),
        "common_blocks",
        "weight",
    )
