"""Approximate containment search over a size-partitioned MinHash LSH index
— the LSH-Ensemble construction (Zhu, Nazi, Zhang, Miller; "LSH Ensemble:
Internet-Scale Domain Search", VLDB 2016), re-expressed as Spark DataFrame
plans.

Beyond-reference operator (the reference has no search surface; kernel
conventions follow its filter-verify design,
/root/reference/py_stringsimjoin/join/set_sim_join.py:16-139). It is the
scale path for the exact ``containment_join``: the exact plan explodes every
right-side token (Σ|x| join rows — fine for titles, expensive for full web
pages), while this index bounds per-document work to ``num_perm`` signature
values regardless of document size, at the price of approximate recall.
Use case: "which of 10^12 pages contain (≥ t of) this snippet?"

Construction — why size partitioning is load-bearing:

    containment c(Q,X) = |Q∩X| / |Q|, but MinHash estimates jaccard
    j(Q,X) = |Q∩X| / |Q∪X|.  The two are related through the sizes:
    c ≥ t  ⇒  j ≥ t·|Q| / (|Q| + |X| − t·|Q|).  A single global jaccard
    threshold therefore does not exist (|X| varies over orders of
    magnitude on the web); partitioning the corpus by |X| into geometric
    size classes [base^p, base^(p+1)) restores one: within class p with
    upper bound u_p = base^(p+1) − 1,

        j*(q, p) = t·q / (q + u_p − t·q)        (q = |tok(Q)|)

    is a sound per-(query, class) jaccard lower bound for every true
    containment hit in that class.

Probing — dynamic band depth instead of per-class indexes: all classes
share ONE signature layout (b bands × r rows, r from the S-curve planner
``plan_lsh_params`` at the ratio-1 reference threshold). A query probes
class p with only its first

    b'(q, p) = min(b, ⌈ ln(1 − p_recall) / ln(1 − j*^r) ⌉)

bands — the band count at which a pair at exactly j* is caught with
probability ≥ ``p_recall`` (true hits have j ≥ j*, so ≥ p_recall holds for
all of them); high-j* classes (similar sizes) need 1-2 bands, distant
classes degrade gracefully toward all b. Classes with u_p < ⌈t·q⌉ cannot
contain a hit (|X| ≥ |Q∩X| ≥ t·q) and are pruned entirely.

Scale shape: corpus side is one tokenize + explode + num_perm-column
hash-aggregate + band explode (b rows/doc) — the persistable index half,
same bones as ``minhash_band_rows``. Query side is small by definition
(a search workload): queries × distinct-classes is a broadcast of a ≤
~log_base(max|X|)-row dim table, never a corpus-sized shuffle. The band
join is an equi-join on (class, band, bucket) — AQE-safe, salting
unnecessary because bucket cardinality grows with corpus size. Verify
rejoins token arrays for the (few) candidates and scores exact containment
JVM-side (array_intersect — zero Python end to end).

Determinism: md5-derived token hashes and fixed permutation parameters
(``minhash_perm_params``) — identical output across engines/runs, which is
what makes the DuckDB driver oracle possible. Recall is approximate BY
DESIGN (deterministically so for a fixed corpus); precision is exact: every
emitted pair is verified c ≥ t on the real token sets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizers import ShingleTokenizer, Tokenizer
from .set_sim_join import as_set_tokenizer
from ..plans.validation import validate_attr, validate_attr_type
from .dedup import (
    MINHASH_MERSENNE,
    band_bucket_exprs,
    minhash_perm_params,
    _token_hash_col,
)


def size_class_col(n: Column, base: float) -> Column:
    """Geometric size class ⌊log_base n⌋ for n ≥ 1 (round-6 FP dodge so
    exact powers of ``base`` land in their own class on every engine)."""
    return F.floor(
        F.round(F.log(n.cast("double")) / math.log(base), 6)
    ).cast("int")


def _class_upper_col(cls: Column, base: float) -> Column:
    """u_p = base^(p+1) − 1: the largest integer set size inside class p."""
    return F.pow(F.lit(base), (cls + F.lit(1)).cast("double")) - F.lit(1.0)


def probe_bands_col(
    q_size: Column,
    u_p: Column,
    threshold: float,
    rows_per_band: int,
    num_bands: int,
    p_recall: float,
) -> Column:
    """b'(q, p): bands to probe so a pair at the class's jaccard bound j*
    is caught with probability ≥ p_recall.  1 − (1 − j*^r)^b' ≥ p_recall
    ⇔ b' ≥ ln(1−p_recall)/ln(1−j*^r); clamped to [1, num_bands]."""
    qd = q_size.cast("double")
    t = F.lit(float(threshold))
    jstar = (t * qd) / (qd + u_p - t * qd)
    pr_one = F.pow(jstar, F.lit(float(rows_per_band)))
    need = F.ceil(
        F.round(
            F.lit(math.log(1.0 - p_recall)) / F.log(F.lit(1.0) - pr_one), 6
        )
    )
    return (
        F.when(pr_one >= 1.0 - 1e-12, F.lit(1))
        .otherwise(F.least(F.greatest(need, F.lit(1)), F.lit(num_bands)))
        .cast("int")
    )


def containment_index_rows(
    corpus: DataFrame,
    id_attr: str,
    text_attr: str,
    tokenizer: Tokenizer | None = None,
    num_perm: int = 64,
    rows_per_band: int = 2,
    size_base: float = 2.0,
) -> DataFrame:
    """The persistable index half: (x_id, _cls, _band, _bucket, _x_size) —
    one row per (document, band). Write this out once (bucketed by
    (_cls, _band, _bucket) at production scale) and every search probes it
    without touching document text again."""
    validate_attr(corpus, id_attr, "corpus")
    validate_attr(corpus, text_attr, "corpus")
    validate_attr_type(corpus, text_attr, "corpus")
    if num_perm % rows_per_band:
        raise ValueError("num_perm must be divisible by rows_per_band")
    tok = as_set_tokenizer(tokenizer or ShingleTokenizer(n=3))
    from ..plans.layout import widen_small_scan

    base = (
        # widened narrow scan; no size(_tokens)>0 filter — the explode below
        # drops empty-token docs identically, and a predicate on the computed
        # array would drag the tokenizer below the widening exchange
        widen_small_scan(
            corpus.select(
                F.col(id_attr).alias("x_id"), F.col(text_attr).alias("_t")
            ).where(F.col("_t").isNotNull())
        ).withColumn("_tokens", tok.spark_col(F.col("_t")))
    )
    rows = base.select(
        "x_id",
        F.size("_tokens").alias("_x_size"),
        F.explode("_tokens").alias("_tok"),
    ).select("x_id", "_x_size", _token_hash_col(F.col("_tok")).alias("_h"))
    params = minhash_perm_params(num_perm)
    sig = rows.groupBy("x_id").agg(
        F.first("_x_size").alias("_x_size"),
        *[
            F.min(
                (F.col("_h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_MERSENNE)
            ).alias(f"_s{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    n_bands = num_perm // rows_per_band
    buckets = band_bucket_exprs(
        [F.col(f"_s{i}") for i in range(num_perm)], n_bands
    )
    return sig.select(
        "x_id",
        size_class_col(F.col("_x_size"), size_base).alias("_cls"),
        F.col("_x_size"),
        F.posexplode(F.array(*buckets)).alias("_band", "_bucket"),
    )


def containment_lsh_search(
    queries: DataFrame,
    corpus: DataFrame,
    q_id_attr: str,
    q_text_attr: str,
    x_id_attr: str,
    x_text_attr: str,
    threshold: float,
    tokenizer: Tokenizer | None = None,
    num_perm: int = 64,
    size_base: float = 2.0,
    p_recall: float = 0.95,
    rows_per_band: int | None = None,
    index_rows: DataFrame | None = None,
) -> DataFrame:
    """(q_id, x_id, containment) for corpus documents that contain ≥
    ``threshold`` of each query's token set — LSH-Ensemble candidates,
    exact verify. Pass a persisted ``containment_index_rows`` result as
    ``index_rows`` to skip re-signing the corpus (it must have been built
    with the same tokenizer / num_perm / rows_per_band / size_base)."""
    validate_attr(queries, q_id_attr, "queries")
    validate_attr(queries, q_text_attr, "queries")
    validate_attr_type(queries, q_text_attr, "queries")
    if not (0 < threshold <= 1):
        raise AssertionError("containment threshold must be in (0, 1]")
    if not (0 < p_recall < 1):
        raise AssertionError("p_recall must be in (0, 1)")
    # containment is a SET measure: force return_set (as the set-sim joins do)
    tok = as_set_tokenizer(tokenizer or ShingleTokenizer(n=3))
    if rows_per_band is None:
        # r=1 by default: containment workloads span huge size ratios, and
        # the far classes see tiny j* — r=1 maximizes the recall reach a
        # fixed num_perm budget buys (P(band hit)=j, the largest possible),
        # while the false positives r=1 admits are bounded by the exact
        # verify and near classes probe few bands anyway (b' small at high
        # j*). Raise r via the parameter (or plan_lsh_params) only when
        # queries and documents are the same scale and candidate volume,
        # not recall, is the binding constraint.
        rows_per_band = 1
    if num_perm % rows_per_band:
        raise ValueError("num_perm must be divisible by rows_per_band")
    n_bands = num_perm // rows_per_band

    if index_rows is None:
        index_rows = containment_index_rows(
            corpus, x_id_attr, x_text_attr, tok, num_perm, rows_per_band,
            size_base,
        )

    # --- query side: signature buckets as ONE array, sizes -----------------
    qbase = (
        queries.select(
            F.col(q_id_attr).alias("q_id"), F.col(q_text_attr).alias("_t")
        )
        .where(F.col("_t").isNotNull())
        .withColumn("_qtokens", tok.spark_col(F.col("_t")))
        # no size filter: empty-token queries generate no band rows, so they
        # can never reach the candidate join — same output, one less
        # duplicated tokenizer evaluation
    )
    qrows = qbase.select(
        "q_id",
        F.size("_qtokens").alias("_q_size"),
        F.explode("_qtokens").alias("_tok"),
    ).select("q_id", "_q_size", _token_hash_col(F.col("_tok")).alias("_h"))
    params = minhash_perm_params(num_perm)
    qsig = qrows.groupBy("q_id").agg(
        F.first("_q_size").alias("_q_size"),
        *[
            F.min(
                (F.col("_h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_MERSENNE)
            ).alias(f"_s{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    qsig = qsig.select(
        "q_id",
        "_q_size",
        F.array(
            *band_bucket_exprs(
                [F.col(f"_s{i}") for i in range(num_perm)], n_bands
            )
        ).alias("_buckets"),
    )

    # --- class dim (≤ ~log_base(max |X|) rows) + per-(query, class) probe --
    classes = index_rows.select("_cls").distinct()
    u_p = _class_upper_col(F.col("_cls"), size_base)
    qc = (
        qsig.crossJoin(F.broadcast(classes))
        .withColumn("_u", u_p)
        # class prune: |X| ≥ |Q∩X| ≥ ⌈t·q⌉ (round-4 dodge, filter-math conv.)
        .where(
            F.col("_u")
            >= F.ceil(
                F.round(F.lit(float(threshold)) * F.col("_q_size"), 4)
            ).cast("double")
        )
        .withColumn(
            "_bprime",
            probe_bands_col(
                F.col("_q_size"), F.col("_u"), threshold, rows_per_band,
                n_bands, p_recall,
            ),
        )
    )
    qprobe = qc.select(
        "q_id",
        "_q_size",
        "_cls",
        F.posexplode("_buckets").alias("_band", "_bucket"),
    ).where(F.col("_band") < F.col("_bprime"))

    cand = (
        qprobe.join(index_rows, ["_cls", "_band", "_bucket"])
        .select("q_id", "x_id")
        .distinct()
    )

    # --- exact verify: rejoin token arrays, JVM intersect ------------------
    qtok = qbase.select("q_id", F.col("_qtokens").alias("_qt"))
    xtok = (
        corpus.select(
            F.col(x_id_attr).alias("x_id"), F.col(x_text_attr).alias("_t")
        )
        .where(F.col("_t").isNotNull())
        .withColumn("_xt", tok.spark_col(F.col("_t")))
        .select("x_id", "_xt")
    )
    ov = F.size(F.array_intersect("_qt", "_xt")).cast("double")
    return (
        cand.join(qtok, "q_id")
        .join(xtok, "x_id")
        .withColumn("containment", ov / F.size("_qt").cast("double"))
        .where(F.col("containment") >= F.lit(float(threshold)))
        .select("q_id", "x_id", "containment")
    )
