"""Fellegi–Sunter probabilistic record linkage (EM-trained match weights).

The reference engine stops at similarity scores above a user threshold
(`/root/reference/py_stringsimjoin/matcher/apply_matcher.py:15` — one
measure, one cutoff); production record linkage combines EVIDENCE FROM
SEVERAL FIELDS probabilistically. This module implements the classic
Fellegi–Sunter model (JASA 1969; the engine behind splink and the Census
Bureau's linkage systems) the way it must be built on Spark:

1. **Agreement vectors** — each candidate pair gets a small integer
   "agreement level" per comparison field (exact / fuzzy band / disagree),
   computed with pure JVM expressions (`F.when`, `levenshtein`,
   `array_intersect`) — zero Python in the per-pair path.
2. **Pattern counts** — one hash aggregation over the level columns. The
   result has at most ∏ levels_i rows (e.g. 3 comparisons × 3 levels =
   27 rows) REGARDLESS of corpus size.
3. **EM on the aggregated counts** — driver-side numpy over the tiny
   pattern table estimates λ (match prevalence) and the per-level m/u
   probabilities. Cost is O(patterns × iterations), INDEPENDENT of the
   number of pairs — this is what makes FS tractable at 10^12 documents:
   the data-sized work is one groupBy; the iterative work never touches
   the cluster.
4. **Scoring** — per-comparison log2(m/u) partial weights baked into a
   CASE-WHEN expression of float literals; the match weight is a sum of
   literals in pinned order (whole-stage codegen, bit-reproducible across
   engines), so scored output is cross-engine hash-stable when the
   parameters are fixed.

Missing values: a NULL on either side of a comparison is level 0
("disagree/unknown") by construction — every level expression must be
total. The provided comparison builders guarantee this.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# comparison definitions
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Comparison:
    """One field comparison: an expression mapping a candidate pair row to
    an agreement level in ``[0, levels)`` (higher = stronger agreement).

    ``spark_level`` must be a total integer expression (NULL-safe) — either
    a ready ``Column`` or a zero-arg callable returning one (the builders
    below pass callables so comparisons can be DEFINED without an active
    SparkContext, e.g. when only their DuckDB mirrors are wanted).
    ``duckdb_level`` is the textual SQL mirror used by oracle queries; it is
    optional and never consulted by the Spark path.
    """

    name: str
    levels: int
    spark_level: object  # Column | Callable[[], Column]
    duckdb_level: str | None = None

    @property
    def col(self) -> str:
        return f"_g_{self.name}"

    def level_column(self) -> Column:
        sl = self.spark_level
        return sl() if callable(sl) else sl


def exact_comparison(name: str, l_attr: str, r_attr: str) -> Comparison:
    """2 levels: 1 iff both sides non-null and equal, else 0."""
    def mk() -> Column:
        lc, rc = F.col(l_attr), F.col(r_attr)
        return (
            F.when(lc.isNotNull() & rc.isNotNull() & (lc == rc), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
        )

    return Comparison(
        name, 2, mk,
        f"(CASE WHEN {l_attr} IS NOT NULL AND {r_attr} IS NOT NULL "
        f"AND {l_attr} = {r_attr} THEN 1 ELSE 0 END)",
    )


def levenshtein_comparison(
    name: str, l_attr: str, r_attr: str, thresholds: tuple[int, ...] = (0, 2)
) -> Comparison:
    """len(thresholds)+1 levels by edit-distance bands, tightest = highest.

    ``thresholds=(0, 2)`` → level 2 iff distance ≤ 0 (exact), level 1 iff
    ≤ 2, else 0. Distance on NULLs is level 0. Uses the JVM's
    threshold-bounded ``levenshtein`` (the same kernel the edit-distance
    join verifies with) so the scan cost is bounded by the largest band.
    """
    ts = tuple(sorted(thresholds))
    n = len(ts)

    def mk() -> Column:
        lc, rc = F.col(l_attr), F.col(r_attr)
        # bounded levenshtein with the widest band; wider never matters.
        # NOTE: the JVM kernel returns -1 when the bound is exceeded, so
        # every band test must be two-sided.
        d = F.levenshtein(lc, rc, ts[-1] + 1)
        # build loosest band first so the TIGHTEST test ends outermost
        expr: Column = F.lit(0)
        for j in range(n - 1, -1, -1):
            t, level = ts[j], n - j  # tightest threshold → highest level
            expr = F.when(
                lc.isNotNull() & rc.isNotNull() & (d >= 0) & (d <= t), F.lit(level)
            ).otherwise(expr)
        return expr.cast("int")

    sql_expr = "0"
    for j in range(n - 1, -1, -1):
        t, level = ts[j], n - j
        sql_expr = (
            f"CASE WHEN {l_attr} IS NOT NULL AND {r_attr} IS NOT NULL AND "
            f"levenshtein({l_attr}, {r_attr}) <= {t} THEN {level} ELSE {sql_expr} END"
        )
    return Comparison(name, n + 1, mk, f"({sql_expr})")


def jaccard_comparison(
    name: str,
    l_tokens: str,
    r_tokens: str,
    thresholds: tuple[float, ...] = (0.4, 0.8),
) -> Comparison:
    """Banded token-set Jaccard over pre-tokenized array columns.

    len(thresholds)+1 levels; highest level for the tightest threshold.
    Jaccard of two NULL/empty sides is level 0. Pure JVM
    ``array_intersect``/``array_union`` — sets must hold distinct tokens
    (the tokenizers' ``return_set=True`` convention).
    """
    ts = tuple(sorted(thresholds))
    n = len(ts)

    def mk() -> Column:
        lt, rt = F.col(l_tokens), F.col(r_tokens)
        inter = F.size(F.array_intersect(lt, rt)).cast("double")
        union = F.size(F.array_union(lt, rt)).cast("double")
        ok = lt.isNotNull() & rt.isNotNull() & (union > 0)
        jac = inter / union
        expr: Column = F.lit(0)
        # ascending thresholds: build loose→tight so the tightest wraps last
        for j, t in enumerate(ts):
            expr = F.when(ok & (jac >= F.lit(float(t))), F.lit(j + 1)).otherwise(expr)
        return expr.cast("int")

    return Comparison(name, n + 1, mk)


# --------------------------------------------------------------------------
# agreement vectors + pattern counts (the only data-sized stages)
# --------------------------------------------------------------------------

def agreement_vectors(pairs: DataFrame, comparisons: list[Comparison]) -> DataFrame:
    """Append one ``_g_<name>`` int level column per comparison.

    Purely declarative — composes into whatever plan produced ``pairs``
    (typically a blocking filter's candset joined back to the attribute
    tables) with no extra shuffle.
    """
    return pairs.select(
        "*", *[c.level_column().alias(c.col) for c in comparisons]
    )


def pattern_counts(agree: DataFrame, comparisons: list[Comparison]) -> DataFrame:
    """``groupBy(level columns).count()`` — ≤ ∏ levels rows out.

    This is the ENTIRE distributed cost of model fitting: one map-side
    combinable hash aggregate over int keys.
    """
    return agree.groupBy(*[c.col for c in comparisons]).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# --------------------------------------------------------------------------
# EM over aggregated pattern counts (driver-side, scale-independent)
# --------------------------------------------------------------------------

@dataclass
class FSParams:
    """Fitted Fellegi–Sunter parameters.

    ``m[name][l]`` = P(level = l | pair is a match); ``u`` likewise for
    non-matches; ``lam`` = P(match). ``n_iter``/``converged`` record the
    EM trajectory.
    """

    lam: float
    m: dict[str, list[float]]
    u: dict[str, list[float]]
    n_iter: int = 0
    converged: bool = False
    comparisons: list[str] = field(default_factory=list)

    def partial_weights(self, name: str) -> list[float]:
        """log2(m/u) per level for one comparison."""
        return [
            float(np.log2(mi / ui))
            for mi, ui in zip(self.m[name], self.u[name])
        ]

    @property
    def prior_weight(self) -> float:
        return float(np.log2(self.lam / (1.0 - self.lam)))


_EPS = 1e-6


def em_fit(
    counts: list[tuple[tuple[int, ...], int]],
    comparisons: list[Comparison],
    lam_init: float = 0.1,
    max_iter: int = 500,
    tol: float = 1e-10,
) -> FSParams:
    """EM for (λ, m, u) over aggregated pattern counts.

    ``counts`` is ``[(pattern_levels, n_pairs), ...]`` — the collected
    ``pattern_counts`` output (tiny by construction). Initialization is the
    standard deterministic one: m starts biased toward agreement
    (higher level → higher probability), u toward disagreement, so the
    "match" class is identified consistently run-to-run (EM is only
    determined up to label swap; this pins the labels).
    """
    if not counts:
        raise ValueError("empty pattern counts")
    K = len(comparisons)
    G = np.asarray([p for p, _ in counts], dtype=np.int64)  # (P, K)
    c = np.asarray([n for _, n in counts], dtype=np.float64)  # (P,)
    if G.shape[1] != K:
        raise ValueError(f"pattern arity {G.shape[1]} != {K} comparisons")
    N = c.sum()

    # deterministic init: for comparison i with L levels, m ∝ 1+level,
    # u ∝ L-level (matches agree more often than random pairs do)
    m = [
        (np.arange(cp.levels, dtype=np.float64) + 1.0)
        / (np.arange(cp.levels) + 1.0).sum()
        for cp in comparisons
    ]
    u = [
        (cp.levels - np.arange(cp.levels, dtype=np.float64))
        / (cp.levels - np.arange(cp.levels)).sum()
        for cp in comparisons
    ]
    lam = float(lam_init)

    prev_ll = -np.inf
    n_iter, converged = 0, False
    for n_iter in range(1, max_iter + 1):
        # E-step over patterns
        log_pm = np.zeros(len(c))
        log_pu = np.zeros(len(c))
        for i in range(K):
            log_pm += np.log(m[i][G[:, i]])
            log_pu += np.log(u[i][G[:, i]])
        a = np.log(lam) + log_pm
        b = np.log1p(-lam) + log_pu
        hi = np.maximum(a, b)
        ll = float((c * (hi + np.log(np.exp(a - hi) + np.exp(b - hi)))).sum())
        w = 1.0 / (1.0 + np.exp(b - a))  # P(match | pattern)

        # M-step
        cm = c * w
        cu = c * (1.0 - w)
        lam = float(np.clip(cm.sum() / N, _EPS, 1.0 - _EPS))
        for i in range(K):
            for arr, cw in ((m, cm), (u, cu)):
                # guard: a class can lose all posterior mass on degenerate
                # inputs — keep its previous distribution instead of 0/0
                tot = cw.sum()
                if tot <= 0.0:
                    continue
                probs = np.asarray([
                    cw[G[:, i] == l].sum() / tot for l in range(comparisons[i].levels)
                ])
                arr[i] = np.clip(probs, _EPS, 1.0 - _EPS)
                arr[i] = arr[i] / arr[i].sum()
        if abs(ll - prev_ll) <= tol * (1.0 + abs(ll)):
            converged = True
            break
        prev_ll = ll

    return FSParams(
        lam=lam,
        m={cp.name: [float(x) for x in m[i]] for i, cp in enumerate(comparisons)},
        u={cp.name: [float(x) for x in u[i]] for i, cp in enumerate(comparisons)},
        n_iter=n_iter,
        converged=converged,
        comparisons=[cp.name for cp in comparisons],
    )


# --------------------------------------------------------------------------
# scoring (literal-weight CASE expressions — codegen'd, hash-stable)
# --------------------------------------------------------------------------

def match_weight_column(
    comparisons: list[Comparison], params: FSParams, include_prior: bool = True
) -> Column:
    """Σ_i log2(m_i[g_i]/u_i[g_i]) (+ prior log2(λ/(1−λ))) as one
    whole-stage-codegen expression of float literals.

    The partial weights are computed ONCE on the driver and injected as
    literals; summation order is the comparison list order, so two engines
    given the same literals produce bit-identical float64 sums.
    """
    total: Column | None = None
    for cp in comparisons:
        ws = params.partial_weights(cp.name)
        expr: Column = F.lit(float(ws[0]))
        for lvl in range(1, cp.levels):
            expr = F.when(F.col(cp.col) == lvl, F.lit(float(ws[lvl]))).otherwise(expr)
        total = expr if total is None else total + expr
    assert total is not None
    if include_prior:
        total = total + F.lit(params.prior_weight)
    return total


def match_probability_column(weight: Column) -> Column:
    """P(match | pattern) from a total (prior-included) log2 weight."""
    bf = F.pow(F.lit(2.0), weight)
    return bf / (bf + F.lit(1.0))


def score_pairs(
    agree: DataFrame,
    comparisons: list[Comparison],
    params: FSParams,
    weight_col: str = "match_weight",
    probability_col: str | None = "match_probability",
) -> DataFrame:
    """Attach match weight (and probability) columns to agreement vectors."""
    w = match_weight_column(comparisons, params)
    out = agree.withColumn(weight_col, w)
    if probability_col:
        out = out.withColumn(probability_col, match_probability_column(F.col(weight_col)))
    return out


def term_frequency_table(records: DataFrame, attr: str) -> DataFrame:
    """(_tf_value, _tf) — each distinct value's share of non-null rows.

    One hash aggregate over the RECORDS table (not the pairs), composed
    lazily with a 1-row broadcast total — no driver job. ``_tf`` is a
    single long/long IEEE division, so it is bit-identical across engines.
    """
    c = (
        records.where(F.col(attr).isNotNull())
        .groupBy(F.col(attr).alias("_tf_value"))
        .agg(F.count(F.lit(1)).alias("_tf_cnt"))
    )
    tot = c.agg(F.sum("_tf_cnt").alias("_tf_total"))
    return c.crossJoin(F.broadcast(tot)).select(
        "_tf_value",
        (F.col("_tf_cnt").cast("double") / F.col("_tf_total").cast("double")).alias("_tf"),
    )


def add_tf_adjustment(
    scored: DataFrame,
    comparison: Comparison,
    params: FSParams,
    tf_table: DataFrame,
    l_attr: str,
    weight_col: str = "match_weight",
    out_col: str = "tf_adjusted_weight",
    ratio_col: str = "tf_ratio",
) -> DataFrame:
    """Term-frequency adjustment (splink's hallmark refinement) for an
    exact comparison: agreeing on a RARE value is stronger evidence than
    agreeing on a common one, so the average-u agreement weight is
    corrected by ``log2(u_agree / tf(value))`` when the pair agrees.

    ``tf_ratio`` (``u_agree / tf``, 1.0 for non-agreeing pairs) is exact
    IEEE arithmetic — cross-engine hash-stable; ``tf_adjusted_weight``
    adds ``log2(tf_ratio)`` to ``weight_col`` (log2 of data-dependent
    values is libm-dependent, so it is pytest-verified, not oracle-hashed).

    Scale shape: one hash join of the pairs against the value-frequency
    table on the agreed value — broadcast when the attr's cardinality is
    small, shuffle hash otherwise; no new pass over the records.
    """
    u_agree = float(params.u[comparison.name][comparison.levels - 1])
    agree = F.col(comparison.col) == (comparison.levels - 1)
    joined = scored.join(
        tf_table,
        F.col(l_attr) == F.col("_tf_value"),
        "left",
    ).drop("_tf_value")
    ratio = F.when(
        agree & F.col("_tf").isNotNull(), F.lit(u_agree) / F.col("_tf")
    ).otherwise(F.lit(1.0))
    return (
        joined.withColumn(ratio_col, ratio)
        .withColumn(out_col, F.col(weight_col) + F.log2(F.col(ratio_col)))
        .drop("_tf")
    )


def classify_pairs(
    scored: DataFrame,
    upper: float,
    lower: float,
    weight_col: str = "match_weight",
    decision_col: str = "decision",
) -> DataFrame:
    """Fellegi–Sunter three-way decision rule (the model's original output):
    weight ≥ ``upper`` → 'match', ≤ ``lower`` → 'nonmatch', in between →
    'possible' (the clerical-review band). Pure expression — composes into
    the scoring plan with no extra stage."""
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    w = F.col(weight_col)
    return scored.withColumn(
        decision_col,
        F.when(w >= float(upper), F.lit("match"))
        .when(w <= float(lower), F.lit("nonmatch"))
        .otherwise(F.lit("possible")),
    )


def fellegi_sunter_link(
    pairs: DataFrame,
    comparisons: list[Comparison],
    lam_init: float = 0.1,
    max_iter: int = 500,
    threshold_weight: float | None = None,
) -> tuple[DataFrame, FSParams]:
    """End-to-end unsupervised linkage over a candidate-pair DataFrame.

    One distributed aggregate (pattern counts, ≤ ∏ levels rows collected),
    EM on the driver, then a single codegen'd scoring pass over the pairs.
    Returns ``(scored_pairs, fitted_params)``; pass ``threshold_weight`` to
    filter to likely matches in the same plan.
    """
    agree = agreement_vectors(pairs, comparisons)
    counts = [
        (tuple(int(r[cp.col]) for cp in comparisons), int(r["n_pairs"]))
        for r in pattern_counts(agree, comparisons).collect()
    ]
    params = em_fit(counts, comparisons, lam_init=lam_init, max_iter=max_iter)
    scored = score_pairs(agree, comparisons, params)
    if threshold_weight is not None:
        scored = scored.where(F.col("match_weight") >= float(threshold_weight))
    return scored, params
