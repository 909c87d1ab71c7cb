"""Blocking- and matching-quality metrics for entity-resolution runs.

Standard ER evaluation over a candidate set (the blocking stage's output)
and a labeled pair table (ground truth):

* pairs completeness (PC) — recall of blocking: |cand ∩ true| / |true|;
* pairs quality (PQ) — precision of blocking: |cand ∩ true| / |cand|;
* reduction ratio (RR) — 1 − |cand| / |ltable × rtable|, the fraction of
  the cross product blocking pruned away.

The reference engine reports none of these (its tests assert exact result
sets); a production linkage pipeline tunes thresholds/blocking on them.
Complements ``plans.pipeline.pairwise_f1`` (cluster-level score) with the
blocking-stage view.

Scale shape: two semi-join counts plus the input cardinalities — four
count jobs on already-keyed data, no new shuffles beyond one hash join per
metric. Key pairs are compared as (l_key, r_key) tuples; pass
``symmetric=True`` when candidates/labels are unordered self-join pairs so
(a,b) matches (b,a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame, l: str, r: str, symmetric: bool) -> DataFrame:
    a, b = F.col(l), F.col(r)
    if symmetric:
        return df.select(
            F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b")
        ).distinct()
    return df.select(a.alias("_a"), b.alias("_b")).distinct()


def blocking_metrics(
    candset: DataFrame,
    labeled: DataFrame,
    cand_l: str = "l_key",
    cand_r: str = "r_key",
    label_l: str = "l_key",
    label_r: str = "r_key",
    ltable: DataFrame | None = None,
    rtable: DataFrame | None = None,
    symmetric: bool = False,
) -> DataFrame:
    """Lazy one-row DataFrame with the same metrics as ``evaluate_blocking``.

    Fully declarative — counts are aggregations cross-joined into one plan
    (each a 1-row broadcast), so it composes into pipelines and runs as ONE
    job instead of four. Pass ``ltable``/``rtable`` to get
    ``reduction_ratio`` (their row counts fold in lazily too; with
    ``symmetric=True`` and ``rtable is ltable``, the cross-product size is
    n·(n−1)/2 — the self-join convention; two distinct tables use n_l·n_r
    even when pairs are unordered, matching ``evaluate_blocking``).
    Integer-ratio divisions are IEEE-exact, so the output is cross-engine
    hash-stable.
    """
    cand = _canon(candset, cand_l, cand_r, symmetric)
    true = _canon(labeled, label_l, label_r, symmetric)
    found = cand.join(true, ["_a", "_b"], "left_semi")

    counts = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(F.broadcast(true.agg(F.count(F.lit(1)).alias("n_true"))))
        .crossJoin(F.broadcast(found.agg(F.count(F.lit(1)).alias("n_true_found"))))
    )
    if ltable is not None and rtable is not None:
        # the n·(n−1)/2 self-join convention applies only when both sides
        # really are the same table — mirroring evaluate_blocking's
        # `symmetric and n_left == n_right` guard; unordered pairs across
        # two DIFFERENT tables still have an n_l·n_r cross product
        if symmetric and rtable is ltable:
            tot = ltable.agg(
                (
                    F.count(F.lit(1)).cast("double")
                    * (F.count(F.lit(1)) - 1).cast("double")
                    / F.lit(2.0)
                ).alias("_total")
            )
        else:
            tot = (
                ltable.agg(F.count(F.lit(1)).cast("double").alias("_nl"))
                .crossJoin(
                    F.broadcast(rtable.agg(F.count(F.lit(1)).cast("double").alias("_nr")))
                )
                .select((F.col("_nl") * F.col("_nr")).alias("_total"))
            )
        counts = counts.crossJoin(F.broadcast(tot))
        rr = F.lit(1.0) - F.col("n_candidates").cast("double") / F.nullif(
            F.col("_total"), F.lit(0.0)
        )
    else:
        rr = F.lit(None).cast("double")

    return counts.select(
        "n_candidates",
        "n_true",
        "n_true_found",
        (
            F.col("n_true_found").cast("double")
            / F.nullif(F.col("n_true"), F.lit(0)).cast("double")
        ).alias("pairs_completeness"),
        (
            F.col("n_true_found").cast("double")
            / F.nullif(F.col("n_candidates"), F.lit(0)).cast("double")
        ).alias("pairs_quality"),
        rr.alias("reduction_ratio"),
    )


def evaluate_blocking(
    candset: DataFrame,
    labeled: DataFrame,
    cand_l: str = "l_key",
    cand_r: str = "r_key",
    label_l: str = "l_key",
    label_r: str = "r_key",
    n_left: int | None = None,
    n_right: int | None = None,
    symmetric: bool = False,
) -> dict:
    """{"pairs_completeness", "pairs_quality", "reduction_ratio",
    "n_candidates", "n_true", "n_true_found"}.

    ``reduction_ratio`` needs the cross-product size — pass ``n_left`` /
    ``n_right`` (row counts of the blocked tables); it is ``None`` when
    omitted. This is an ACTION (runs count jobs), not a lazy plan — call it
    on evaluation runs, not in a per-query hot path.
    """
    cand = _canon(candset, cand_l, cand_r, symmetric)
    true = _canon(labeled, label_l, label_r, symmetric)
    n_cand = cand.count()
    n_true = true.count()
    n_found = cand.join(true, ["_a", "_b"], "left_semi").count()
    pc = n_found / n_true if n_true else None
    pq = n_found / n_cand if n_cand else None
    rr = None
    if n_left is not None and n_right is not None:
        total = (
            n_left * (n_left - 1) / 2 if symmetric and n_left == n_right
            else n_left * n_right
        )
        rr = 1.0 - n_cand / total if total else None
    return {
        "pairs_completeness": pc,
        "pairs_quality": pq,
        "reduction_ratio": rr,
        "n_candidates": n_cand,
        "n_true": n_true,
        "n_true_found": n_found,
    }


def bcubed_metrics(
    assignments: DataFrame,
    key_attr: str,
    pred_attr: str,
    true_attr: str,
    exact_order: bool = False,
) -> DataFrame:
    """B-cubed precision / recall / F1 — lazy one-row DataFrame.

    The standard cluster-level ER metric (Bagga & Baldwin): per record e,
    precision(e) = |C(e) ∩ L(e)| / |C(e)| and recall(e) = |C(e) ∩ L(e)| /
    |L(e)| where C/L are e's predicted/true clusters; the metrics average
    over records. Unlike pairwise F1 it is defined for singleton clusters
    and weights every record equally regardless of cluster size.

    Never materializes per-record terms: records in the same
    (pred, true) block share their scores, so the plan aggregates once by
    (pred, true) — ``n_ct`` rows — and folds
    ``n_ct·(n_ct/n_c)`` / ``n_ct·(n_ct/n_t)`` masses. Three hash
    aggregations + two joins on cluster ids; nothing is quadratic and
    nothing depends on cluster sizes fitting anywhere.

    ``exact_order=False`` (production) sums the per-block masses with a
    distributed SUM — order-nondeterministic in the last ulps, fine
    operationally. ``exact_order=True`` folds them sequentially in
    (pred, true) order — bit-identical to a DuckDB
    ``list_aggregate(list(term ORDER BY c, t), 'sum')``, the driver-oracle
    configuration (same trade as operators/weighted.py) — at the cost of
    collecting the block-term list into one row; use only where the number
    of (pred, true) blocks is driver-sized.

    Output columns: ``bcubed_precision``, ``bcubed_recall``, ``bcubed_f1``,
    ``n_records`` (all NULL-free; an empty input yields one row of NULLs
    via the CASE guards). Rows whose pred or true id is NULL are excluded
    — a record with no cluster assignment has no defined B³ score.
    """
    base = assignments.select(
        F.col(key_attr).alias("_k"),
        F.col(pred_attr).alias("_c"),
        F.col(true_attr).alias("_t"),
    ).where(F.col("_c").isNotNull() & F.col("_t").isNotNull())
    ct = base.groupBy("_c", "_t").agg(F.count("*").alias("_n_ct"))
    cs = base.groupBy("_c").agg(F.count("*").alias("_n_c"))
    ts = base.groupBy("_t").agg(F.count("*").alias("_n_t"))
    sq = (F.col("_n_ct") * F.col("_n_ct")).cast("double")
    terms = (
        ct.join(cs, "_c")
        .join(ts, "_t")
        .select(
            "_c",
            "_t",
            F.col("_n_ct"),
            (sq / F.col("_n_c").cast("double")).alias("_pm"),
            (sq / F.col("_n_t").cast("double")).alias("_rm"),
        )
    )
    if exact_order:
        folded = terms.agg(
            F.array_sort(
                F.collect_list(F.struct("_c", "_t", "_pm", "_rm"))
            ).alias("_xs"),
            F.sum("_n_ct").alias("_n"),
        ).select(
            F.aggregate(
                "_xs", F.lit(0.0), lambda acc, x: acc + x["_pm"]
            ).alias("_ps"),
            F.aggregate(
                "_xs", F.lit(0.0), lambda acc, x: acc + x["_rm"]
            ).alias("_rs"),
            "_n",
        )
    else:
        folded = terms.agg(
            F.sum("_pm").alias("_ps"),
            F.sum("_rm").alias("_rs"),
            F.sum("_n_ct").alias("_n"),
        )
    nd = F.col("_n").cast("double")
    p = F.when(F.col("_n") > 0, F.col("_ps") / nd)
    r = F.when(F.col("_n") > 0, F.col("_rs") / nd)
    return folded.select(
        p.alias("bcubed_precision"),
        r.alias("bcubed_recall"),
        F.when(
            (F.col("_n") > 0) & (F.col("_ps") + F.col("_rs") > 0),
            F.lit(2.0) * (F.col("_ps") / nd) * (F.col("_rs") / nd)
            / (F.col("_ps") / nd + F.col("_rs") / nd),
        ).alias("bcubed_f1"),
        F.col("_n").alias("n_records"),
    )


def sample_pairs_for_review(
    pairs: DataFrame,
    l_key: str,
    r_key: str,
    score_col: str,
    band_edges: list[float],
    n_per_band: int,
) -> DataFrame:
    """Deterministic stratified sample of scored pairs for clerical review.

    The step after probabilistic scoring (Fellegi–Sunter's 'possible'
    decision band, or any score distribution): a human labels a fixed
    number of pairs per score band to calibrate thresholds / train a
    matcher. ``band_edges`` (ascending) split the score range into
    ``len(edges)+1`` bands (``band`` = number of edges ≤ score); within
    each band the sample is the first ``n_per_band`` pairs ordered by
    ``md5(l || '|' || r)`` — a deterministic pseudo-random order every
    engine reproduces bit-for-bit (no rand(), no partition-order
    dependence), so the labeled set is stable across reruns and engines.

    Output: ``(band, l_key, r_key, score_col, _rn)``.

    Scale shape: one window per band partition; the ``_rn <= n`` filter
    triggers Spark's WindowGroupLimit so each partition keeps only a
    top-n heap — no full sort of billion-pair bands.
    """
    if list(band_edges) != sorted(band_edges):
        raise AssertionError("band_edges must be ascending")
    from pyspark.sql import Window

    score = F.col(score_col)
    # coalesce each comparison: a NULL score lands in band 0 (matching the
    # SQL CASE form every oracle uses) instead of a NULL band
    band = sum(
        F.coalesce((score >= F.lit(float(e))).cast("int"), F.lit(0))
        for e in band_edges
    ).alias("band")
    okey = F.md5(
        F.concat_ws("|", F.col(l_key).cast("string"), F.col(r_key).cast("string"))
    )
    w = Window.partitionBy("band").orderBy(okey, F.col(l_key), F.col(r_key))
    return (
        pairs.select(band, l_key, r_key, score_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(n_per_band))
    )


def rand_metrics(
    assignments: DataFrame,
    key_attr: str,
    pred_attr: str,
    true_attr: str,
) -> DataFrame:
    """Rand Index and Adjusted Rand Index (Hubert & Arabie) — lazy one-row
    DataFrame, the partition-agreement metrics next to ``bcubed_metrics``.

    With contingency counts n_ct over (pred, true) blocks, cluster sizes
    n_c, truth sizes n_t and n records total:

        RI  = (C(n,2) + 2·ΣC(n_ct,2) − ΣC(n_c,2) − ΣC(n_t,2)) / C(n,2)
        ARI = (ΣC(n_ct,2) − E) / ((ΣC(n_c,2)+ΣC(n_t,2))/2 − E),
              E = ΣC(n_c,2)·ΣC(n_t,2) / C(n,2)

    Exactness across engines without ordered folds: every ΣC(·,2) is an
    INTEGER, summed in decimal(38,0) (DuckDB oracle: HUGEINT — headroom to
    ~10^19 records, far past the 10^12 target where int64 pair counts
    already overflow), and both engines round once, identically, at the
    final double division. Scale shape: three partial-aggregated hash
    aggregations (by (pred,true), pred, true), each folded to one row —
    no joins at all, the three scalar rows combine via 1-row cross joins.

    Conventions: rows with NULL pred or true are excluded (no defined
    assignment); n < 2 yields NULL metrics (no pairs); a zero ARI
    denominator (both partitions trivial — all singletons or one cluster —
    and equal) yields ARI = 1.0, the scikit-learn convention. Output:
    ``rand_index``, ``adjusted_rand_index``, ``n_records``.
    """
    base = assignments.select(
        F.col(key_attr).alias("_k"),
        F.col(pred_attr).alias("_c"),
        F.col(true_attr).alias("_t"),
    ).where(F.col("_c").isNotNull() & F.col("_t").isNotNull())

    def _pairs2(cnt):  # n*(n-1) in decimal(38,0) — exact integer mass
        d = cnt.cast("decimal(19,0)")
        return (d * (d - 1)).cast("decimal(38,0)")

    ct = (
        base.groupBy("_c", "_t")
        .agg(F.count("*").alias("_n"))
        .agg(
            F.sum(_pairs2(F.col("_n"))).alias("_s_ct"),
            F.sum("_n").alias("_n_total"),
        )
    )
    cs = (
        base.groupBy("_c")
        .agg(F.count("*").alias("_n"))
        .agg(F.sum(_pairs2(F.col("_n"))).alias("_s_a"))
    )
    ts = (
        base.groupBy("_t")
        .agg(F.count("*").alias("_n"))
        .agg(F.sum(_pairs2(F.col("_n"))).alias("_s_b"))
    )
    one = ct.crossJoin(cs).crossJoin(ts)
    # all ×(n−1) masses halve to pair counts only at the double stage —
    # one rounding, same op order as the SQL oracle
    sc = F.coalesce(F.col("_s_ct").cast("double"), F.lit(0.0)) / 2.0
    sa = F.coalesce(F.col("_s_a").cast("double"), F.lit(0.0)) / 2.0
    sb = F.coalesce(F.col("_s_b").cast("double"), F.lit(0.0)) / 2.0
    n = F.coalesce(F.col("_n_total"), F.lit(0)).cast("decimal(19,0)")
    tt = (n * (n - 1)).cast("decimal(38,0)").cast("double") / 2.0
    e = sa * sb / tt
    denom = (sa + sb) / 2.0 - e
    return one.select(
        F.when(tt > 0.0, (tt + 2.0 * sc - sa - sb) / tt).alias("rand_index"),
        F.when(tt > 0.0,
               F.when(denom == 0.0, F.lit(1.0)).otherwise((sc - e) / denom))
        .alias("adjusted_rand_index"),
        F.coalesce(F.col("_n_total"), F.lit(0)).cast("long").alias("n_records"),
    )


def _partition_info_plan(
    assignments: DataFrame,
    key_attr: str,
    pred_attr: str,
    true_attr: str,
    exact_order: bool,
) -> DataFrame:
    """Shared information-theoretic plan for nmi_metrics / vi_metrics: one
    row with _n (non-NULL records), _k_c/_k_t (cluster counts), _mi (mutual
    information, nats), _hcs/_hts (signed entropy sums Σ p·ln p). Three hash
    aggregations + two cluster-id joins; ``exact_order`` trades the
    distributed SUM for a sorted left fold (DuckDB-bit-exact)."""
    base = assignments.select(
        F.col(key_attr).alias("_k"),
        F.col(pred_attr).alias("_c"),
        F.col(true_attr).alias("_t"),
    ).where(F.col("_c").isNotNull() & F.col("_t").isNotNull())
    ct = base.groupBy("_c", "_t").agg(F.count("*").alias("_n_ct"))
    cs = base.groupBy("_c").agg(F.count("*").alias("_n_c"))
    ts = base.groupBy("_t").agg(F.count("*").alias("_n_t"))
    n_row = cs.agg(
        F.sum("_n_c").alias("_n"), F.count("*").alias("_k_c")
    ).crossJoin(ts.agg(F.count("*").alias("_k_t")))
    n_d = F.col("_n").cast("double")

    def _fold(df, term, order_cols, alias):
        """Σ term — sorted left fold (exact_order) or distributed sum."""
        if exact_order:
            return df.agg(
                F.array_sort(
                    F.collect_list(F.struct(*order_cols, term.alias("_v")))
                ).alias("_xs")
            ).select(
                F.aggregate("_xs", F.lit(0.0), lambda a, x: a + x["_v"]).alias(
                    alias
                )
            )
        return df.agg(F.coalesce(F.sum(term), F.lit(0.0)).alias(alias))

    terms = ct.join(cs, "_c").join(ts, "_t").crossJoin(F.broadcast(n_row))
    nct_d = F.col("_n_ct").cast("double")
    mi_term = (nct_d / n_d) * F.log(
        (n_d * nct_d) / (F.col("_n_c").cast("double") * F.col("_n_t").cast("double"))
    )
    mi = _fold(terms, mi_term, [F.col("_c"), F.col("_t")], "_mi")
    hc_term = (F.col("_n_c").cast("double") / n_d) * F.log(
        F.col("_n_c").cast("double") / n_d
    )
    hc = _fold(cs.crossJoin(F.broadcast(n_row)), hc_term, [F.col("_c")], "_hcs")
    ht_term = (F.col("_n_t").cast("double") / n_d) * F.log(
        F.col("_n_t").cast("double") / n_d
    )
    ht = _fold(ts.crossJoin(F.broadcast(n_row)), ht_term, [F.col("_t")], "_hts")
    return n_row.crossJoin(mi).crossJoin(hc).crossJoin(ht)


def nmi_metrics(
    assignments: DataFrame,
    key_attr: str,
    pred_attr: str,
    true_attr: str,
    exact_order: bool = False,
) -> DataFrame:
    """Normalized Mutual Information (arithmetic-mean normalization, the
    scikit-learn default) between the predicted and true partitions — lazy
    one-row DataFrame completing the cluster-metric set (pairwise F1,
    B-cubed, Rand/ARI, NMI — the four ER papers report).

        MI  = Σ_ct (n_ct/n)·ln(n·n_ct/(n_c·n_t))        (nats)
        H_C = −Σ_c (n_c/n)·ln(n_c/n),  H_T analogous
        NMI = MI / ((H_C + H_T)/2)

    Conventions: NULL pred/true rows are excluded; empty input → NULL
    metrics; both partitions trivial (one cluster each) → NMI 1.0; one
    side trivial → MI 0 and NMI 0 (all scikit-learn's conventions).

    Bit-exactness across engines (same trade as ``bcubed_metrics`` /
    ``unigram_cross_entropy``): terms use ``ln`` (libm-stable, unlike
    log2) and ``exact_order=True`` folds them sequentially in cluster-id
    order — identical to a DuckDB ``list_aggregate(list(t ORDER BY ...),
    'sum')`` — at the cost of collecting the block-term list into one row;
    the default distributed SUM is the production configuration. Scale
    shape: the bcubed plan — three hash aggregations, two joins on
    cluster ids, nothing quadratic, nothing driver-side by default.
    """
    one = _partition_info_plan(
        assignments, key_attr, pred_attr, true_attr, exact_order
    )
    h_c = -F.col("_hcs")
    h_t = -F.col("_hts")
    denom = (h_c + h_t) / 2.0
    return one.select(
        F.when(F.col("_n").isNull() | (F.col("_n") <= 0), F.lit(None))
        .when((F.col("_k_c") == 1) & (F.col("_k_t") == 1), F.lit(1.0))
        .when(denom == 0.0, F.lit(0.0))
        .otherwise(F.col("_mi") / denom)
        .alias("nmi"),
        F.when(F.col("_n") > 0, F.col("_mi")).alias("mutual_info"),
        F.when(F.col("_n") > 0, h_c).alias("entropy_pred"),
        F.when(F.col("_n") > 0, h_t).alias("entropy_true"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_records"),
    )


def vi_metrics(
    assignments: DataFrame,
    key_attr: str,
    pred_attr: str,
    true_attr: str,
    exact_order: bool = False,
) -> DataFrame:
    """Variation of Information (Meilă 2007) between the predicted and true
    partitions — the metric-space companion to NMI (VI is a true metric on
    partitions; NMI is not), reported by ER/clustering papers alongside it.

        VI  = H(C) + H(T) − 2·MI                          (nats)
        NVI = VI / ln(n)    for n > 1  (Meilă's bound VI ≤ ln n → [0, 1])

    Conventions match ``nmi_metrics``: NULL pred/true rows are excluded;
    empty input → NULL metrics; identical partitions → VI 0 exactly (the
    algebra cancels term-by-term only when summed in the same order, so
    the perfect case is special-cased on _k_c == _k_t == #distinct (c,t)
    pairs being unnecessary — VI 0 falls out because MI = H(C) = H(T));
    n == 1 → NVI NULL (ln 1 = 0 denominator), VI 0.

    Same plan and scale shape as ``nmi_metrics`` (shared
    ``_partition_info_plan``): three hash aggregations, two cluster-id
    joins, nothing quadratic, one-row lazy result.
    """
    one = _partition_info_plan(
        assignments, key_attr, pred_attr, true_attr, exact_order
    )
    h_c = -F.col("_hcs")
    h_t = -F.col("_hts")
    vi = h_c + h_t - 2.0 * F.col("_mi")
    n_d = F.col("_n").cast("double")
    return one.select(
        F.when(F.col("_n").isNull() | (F.col("_n") <= 0), F.lit(None))
        .otherwise(vi)
        .alias("vi"),
        F.when(F.col("_n") > 1, vi / F.log(n_d)).alias("nvi"),
        F.when(F.col("_n") > 0, F.col("_mi")).alias("mutual_info"),
        F.when(F.col("_n") > 0, h_c).alias("entropy_pred"),
        F.when(F.col("_n") > 0, h_t).alias("entropy_true"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_records"),
    )


def v_measure_metrics(
    assignments: DataFrame,
    key_attr: str,
    pred_attr: str,
    true_attr: str,
    exact_order: bool = False,
) -> DataFrame:
    """Homogeneity / completeness / V-measure (Rosenberg & Hirschberg,
    EMNLP 2007) between the predicted and true partitions — the
    conditional-entropy pair NMI blends away: homogeneity says "each
    predicted cluster holds one true entity" (over-merge detector),
    completeness says "each true entity lands in one predicted cluster"
    (over-split detector); V is their harmonic mean.

        homogeneity  = 1 − H(T|C)/H(T) = MI / H(T)    (1.0 when H(T)=0)
        completeness = 1 − H(C|T)/H(C) = MI / H(C)    (1.0 when H(C)=0)
        V            = 2hc/(h+c)                      (0.0 when h+c=0)

    Conventions are scikit-learn's (single-cluster sides score 1.0 on
    their axis) except empty input → NULL metrics, matching nmi_metrics.
    Same shared plan and scale shape as nmi/vi (``_partition_info_plan``):
    three hash aggregations, two cluster-id joins, one-row lazy result;
    ``exact_order=True`` is the bit-exact driver-oracle configuration.
    """
    one = _partition_info_plan(
        assignments, key_attr, pred_attr, true_attr, exact_order
    )
    h_c = -F.col("_hcs")  # entropy of the PREDICTED partition
    h_t = -F.col("_hts")  # entropy of the TRUE partition
    hom = F.when(F.col("_k_t") == 1, F.lit(1.0)).otherwise(F.col("_mi") / h_t)
    com = F.when(F.col("_k_c") == 1, F.lit(1.0)).otherwise(F.col("_mi") / h_c)
    two = one.select(
        "_n",
        F.when(F.col("_n") > 0, hom).alias("homogeneity"),
        F.when(F.col("_n") > 0, com).alias("completeness"),
    )
    hc_sum = F.col("homogeneity") + F.col("completeness")
    return two.select(
        "homogeneity",
        "completeness",
        F.when(F.col("_n").isNull() | (F.col("_n") <= 0), F.lit(None))
        .when(hc_sum == 0.0, F.lit(0.0))
        .otherwise(
            2.0 * F.col("homogeneity") * F.col("completeness") / hc_sum
        )
        .alias("v_measure"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_records"),
    )


def pr_curve(
    scored: DataFrame,
    l_key: str,
    r_key: str,
    score_attr: str,
    labeled: DataFrame,
    label_l: str,
    label_r: str,
    symmetric: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """Precision/recall/F1 at every candidate threshold, in one pass.

    For each distinct score value ``s`` (optionally quantized to
    ``round_to`` decimals), treats ``score >= s`` as the positive
    prediction and reports the confusion counts against ``labeled`` (the
    ground-truth matching pairs). This is the threshold-tuning table every
    linkage deployment reads before fixing its match cutoff — the
    reference engine has no evaluation surface at all (its tests assert
    exact result sets).

    Output: ``(threshold, predicted, tp, precision, recall, f1)`` — one
    row per distinct score, thresholds descending in cumulative semantics
    (each row counts ALL pairs at-or-above it). ``f1`` is NULL where
    precision + recall is 0; ``recall`` is NULL when ``labeled`` is empty.

    Scale shape: duplicate pairs collapse via one pair-keyed max-score
    aggregation; truth membership is one hash join; then everything
    reduces to ONE row per distinct score before the cumulative window
    runs — so the unpartitioned window (a single task by construction)
    only ever sees #distinct-scores rows. With continuous scores at
    10^12-pair scale, pass ``round_to`` to bound that cardinality (1e4
    rows at ``round_to=4``); set-overlap measures are already quantized
    by their rational form.
    """
    from pyspark.sql import Window

    sc = F.col(score_attr).cast("double")
    if round_to is not None:
        sc = F.round(sc, int(round_to))
    # canon with the score column carried through (per-pair max score)
    a, b = F.col(l_key), F.col(r_key)
    if symmetric:
        key_cols = [F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b")]
    else:
        key_cols = [a.alias("_a"), b.alias("_b")]
    # NULL scores carry no threshold information: a pair whose every score
    # is NULL would otherwise survive the max() as a NULL `_s` group and
    # emit a bogus NULL-threshold row that the descending window counts
    # against every real threshold. Drop them before the aggregation.
    dedup = (
        scored.select(*key_cols, sc.alias("_s"))
        .where(F.col("_s").isNotNull())
        .groupBy("_a", "_b")
        .agg(F.max("_s").alias("_s"))
    )
    truth = _canon(labeled, label_l, label_r, symmetric)
    flagged = dedup.join(
        truth.withColumn("_t", F.lit(1)), ["_a", "_b"], "left"
    ).select("_s", F.coalesce(F.col("_t"), F.lit(0)).cast("long").alias("_t"))
    per_score = flagged.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_t").alias("_nt")
    )
    w = Window.orderBy(F.col("_s").desc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.select(
        F.col("_s").alias("threshold"),
        F.sum("_n").over(w).alias("predicted"),
        F.sum("_nt").over(w).alias("tp"),
    )
    total = truth.agg(F.count(F.lit(1)).alias("_total"))
    p = F.col("tp").cast("double") / F.col("predicted").cast("double")
    r = F.when(
        F.col("_total") > 0,
        F.col("tp").cast("double") / F.col("_total").cast("double"),
    )
    out = cum.crossJoin(F.broadcast(total)).select(
        "threshold",
        "predicted",
        "tp",
        p.alias("precision"),
        r.alias("recall"),
    )
    pc, rc = F.col("precision"), F.col("recall")
    return out.select(
        "*",
        F.when(
            (pc + rc) > 0, F.lit(2.0) * pc * rc / (pc + rc)
        ).alias("f1"),
    )
