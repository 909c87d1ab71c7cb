"""Weighted-token cosine similarity join (TF-IDF / inverse-df weights).

The reference engine scores token sets unweighted (every token counts 1 —
`/root/reference/py_stringsimjoin/join/jaccard_join_py.py:17`); real
entity-resolution pipelines weight tokens by rarity so that sharing
"polyethylene" means more than sharing "the". This operator is the weighted
counterpart of ``cosine_join``:

    sim(l, r) = Σ_{tok ∈ l∩r} w(tok)² / (‖l‖ · ‖r‖),   ‖x‖ = √Σ_{tok∈x} w(tok)²

with set-semantics tf (each distinct token once per row, matching the
reference's ``return_set=True`` tokenizer convention), and w(tok) an
inverse-document-frequency weight computed over the union of both input
tables' rows.

Two weighting rules:

* ``weighting="idf"`` — w = ln((N+1)/(df+1)) + 1 (smoothed log-idf, the
  production default). ``ln`` is not guaranteed bit-identical across math
  libraries, so this path is verified in pytest with a 1e-12 tolerance
  rather than by the cross-engine hash oracle.
* ``weighting="inv_df"`` — w = 1/df. Division is a correctly-rounded IEEE
  op on every engine, so this rule gives BIT-IDENTICAL scores on Spark and
  DuckDB — the driver-oracle configuration.

Scale shape: tokenize once per side → document frequencies via one hash
aggregation → exploded token join → per-pair dot product + norms →
threshold filter. No UDFs anywhere; every stage is a hash shuffle on
bounded keys.

``value_dedup=True`` scores each DISTINCT join-attr value once and expands
to row pairs afterwards through md5(value) keys — the same design as the
set-sim kernel's value dedup (operators/set_sim_join.py): on dup-heavy
attrs (k rows per value) the token join shrinks by k², while document
frequencies are still counted over ROWS (each value weighted by its row
count), so the output is bit-identical to the row-level plan. Without it a
value repeated 25k times would put 625M pairs per shared token through the
shuffle — the exploding-join trap.

Summation-order note: floating-point addition is not associative, so a
``groupBy().sum()`` dot product is not bit-reproducible across engines (or
even across runs with different partitionings — the differences are ≤ a few
ulps and irrelevant operationally). ``exact_order=True`` instead collects
each pair's per-token products, sorts by token, and folds sequentially —
bit-identical to a DuckDB ``list_aggregate(list(... ORDER BY tok), 'sum')``
— at the cost of materializing the per-pair product list. The driver oracle
query uses ``exact_order=True`` + ``weighting="inv_df"``; production uses
the default fast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizers import Tokenizer
from ..plans.cache import tracked_cache as _tc
from ..plans.skew import (
    resolve_salt_parallelism,
    salted_token_join,
    sampled_hot_tokens,
)
from ..plans.validation import validate_attr, validate_attr_type, validate_threshold


def _rows_df(df: DataFrame, key: str, attr: str, side: str) -> DataFrame:
    """(side_key, _val) for rows with a non-null join attr."""
    return df.where(F.col(attr).isNotNull()).select(
        F.col(key).alias(f"{side}_key"), F.col(attr).alias("_val")
    )


def tfidf_cosine_join(
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    weighting: str = "idf",
    value_dedup: bool = False,
    exact_order: bool = False,
    out_sim_col: str = "sim",
) -> DataFrame:
    """Pairs (l_key, r_key, sim) with weighted cosine ``sim >= threshold``.

    ``weighting``: ``"idf"`` (smoothed log-idf, production) or ``"inv_df"``
    (1/df — IEEE-exact cross-engine, the oracle rule). Document frequencies
    and N are computed over the union of both inputs' non-null rows, so a
    self-join counts each document twice — a uniform definition both engines
    replicate (and a wash under any monotone rarity weighting).
    """
    validate_attr(ltable, l_key_attr, "left")
    validate_attr(rtable, r_key_attr, "right")
    validate_attr(ltable, l_join_attr, "left")
    validate_attr(rtable, r_join_attr, "right")
    validate_attr_type(ltable, l_join_attr, "left")
    validate_attr_type(rtable, r_join_attr, "right")
    validate_threshold(threshold, "cosine")
    if weighting not in ("idf", "inv_df"):
        raise AssertionError(f"unknown weighting {weighting!r}")

    toks_expr = F.array_distinct(tokenizer.spark_col(F.col("_val")))

    # The scoring UNIT is a row (value_dedup=False) or a distinct join-attr
    # value (True). Each unit carries _cnt = number of rows it stands for,
    # so document frequencies and N stay row-level in both modes and the
    # two plans produce identical output.
    def units_and_map(rows: DataFrame, side: str):
        if value_dedup:
            units = rows.groupBy("_val").agg(F.count(F.lit(1)).alias("_cnt"))
            units = units.select(
                F.unhex(F.md5("_val")).alias("_uk"), "_cnt", toks_expr.alias("_toks")
            )
            mapping = rows.select(
                f"{side}_key", F.unhex(F.md5("_val")).alias("_uk")
            )
        else:
            units = rows.select(
                F.col(f"{side}_key").alias("_uk"),
                F.lit(1).alias("_cnt"),
                toks_expr.alias("_toks"),
            )
            mapping = None
        units = units.where(F.size("_toks") > 0)
        return units, mapping

    l_rows = _rows_df(ltable, l_key_attr, l_join_attr, "l")
    r_rows = _rows_df(rtable, r_key_attr, r_join_attr, "r")
    # each side feeds 2-3 downstream aggregations (df/N/explode) — persist
    # the tokenized units once rather than re-tokenizing per consumer
    l_units, l_map = units_and_map(l_rows, "l")
    r_units, r_map = units_and_map(r_rows, "r")
    l_units = l_units.persist().transform(_tc)
    r_units = r_units.persist().transform(_tc)

    # one document-frequency aggregation over both sides' exploded tokens,
    # each unit contributing its row count — df = ROWS containing the token
    all_toks = l_units.select(F.explode("_toks").alias("_tok"), "_cnt").unionAll(
        r_units.select(F.explode("_toks").alias("_tok"), "_cnt")
    )
    df_tab = all_toks.groupBy("_tok").agg(F.sum("_cnt").alias("_df"))
    if weighting == "idf":
        # N rides in as a lazy 1-row broadcast (no plan-time count jobs —
        # the same no-eager-scans rule the sample-stats layer follows)
        n_df = (
            l_units.select(F.sum("_cnt").alias("_n"))
            .unionAll(r_units.select(F.sum("_cnt").alias("_n")))
            .agg(F.sum("_n").cast("double").alias("_N"))
        )
        df_tab = df_tab.crossJoin(F.broadcast(n_df))
        w_expr = F.log((F.col("_N") + F.lit(1.0)) / (F.col("_df").cast("double") + F.lit(1.0))) + F.lit(1.0)
    else:  # inv_df — IEEE-exact in both engines
        w_expr = F.lit(1.0) / F.col("_df").cast("double")
    weights = df_tab.select("_tok", w_expr.alias("_w"))

    def exploded(units: DataFrame, side: str) -> DataFrame:
        e = units.select(F.col("_uk").alias(f"_{side}uk"), F.explode("_toks").alias("_tok"))
        # no broadcast HINT on the weight table: it has one row per DISTINCT
        # token, i.e. it is vocabulary-sized — unbounded on web corpora. Let
        # Catalyst/AQE broadcast it when its measured size is under the
        # threshold and fall back to a shuffle hash join when it is not;
        # forcing the broadcast would collect a multi-GB vocabulary to the
        # driver at exactly the scale this module targets.
        return e.join(weights, "_tok").select(
            f"_{side}uk", "_tok", F.col("_w").alias(f"_{side}w")
        )

    l_ex = exploded(l_units, "l")
    r_ex = exploded(r_units, "r")

    # per-unit norms, summed in sorted-token order so both the fast and the
    # exact paths (and the SQL oracle) compute the identical norm value
    def norms(ex: DataFrame, side: str) -> DataFrame:
        per = ex.groupBy(f"_{side}uk").agg(
            F.sort_array(F.collect_list(F.struct("_tok", f"_{side}w"))).alias("_ws")
        )
        sq = F.aggregate(
            "_ws",
            F.lit(0.0),
            lambda acc, s: acc + s[f"_{side}w"] * s[f"_{side}w"],
        )
        return per.select(f"_{side}uk", F.sqrt(sq).alias(f"_{side}norm"))

    l_norm = norms(l_ex, "l")
    r_norm = norms(r_ex, "r")

    # the pair join explodes quadratically on hot tokens — same Zipf hazard
    # and same mitigation as the overlap joins (plans/skew.py): hot tokens
    # detected on a bounded row sample, per-token proportional salting,
    # output-invariant. With value_dedup the sampled (row-level) counts
    # over-estimate a dup-heavy token's share among the distinct-value
    # units actually joined — a balance-only inaccuracy that costs at most
    # bounded build replication, never correctness.
    spark = ltable.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_salts = resolve_salt_parallelism(ltable, n_shuffle)
    hot = sampled_hot_tokens(
        spark, [(ltable, l_join_attr), (rtable, r_join_attr)], tokenizer, n_salts
    )
    pairs = salted_token_join(
        l_ex,
        r_ex,
        hot,
        l_salt_key="_luk",
        pin_partitions=n_shuffle if hot else None,
    ).select("_luk", "_ruk", "_tok", (F.col("_lw") * F.col("_rw")).alias("_p"))
    if exact_order:
        dot = (
            pairs.groupBy("_luk", "_ruk")
            .agg(F.sort_array(F.collect_list(F.struct("_tok", "_p"))).alias("_ps"))
            .select(
                "_luk",
                "_ruk",
                F.aggregate("_ps", F.lit(0.0), lambda acc, s: acc + s["_p"]).alias(
                    "_dot"
                ),
            )
        )
    else:
        dot = pairs.groupBy("_luk", "_ruk").agg(F.sum("_p").alias("_dot"))

    scored = (
        dot.join(l_norm, "_luk")
        .join(r_norm, "_ruk")
        .select(
            "_luk",
            "_ruk",
            (F.col("_dot") / (F.col("_lnorm") * F.col("_rnorm"))).alias(out_sim_col),
        )
        .where(F.col(out_sim_col) >= F.lit(float(threshold)))
    )
    if not value_dedup:
        return scored.select(
            F.col("_luk").alias("l_key"), F.col("_ruk").alias("r_key"), out_sim_col
        )
    # expand scored value pairs back to row pairs (equality joins on the
    # 16-byte md5 value keys — identical output to the row-level plan)
    return (
        scored.join(l_map.withColumnRenamed("_uk", "_luk"), "_luk")
        .join(r_map.withColumnRenamed("_uk", "_ruk"), "_ruk")
        .select("l_key", "r_key", out_sim_col)
    )


def soft_tfidf_score_pairs(
    candset: DataFrame,
    candset_l_key_attr: str,
    candset_r_key_attr: str,
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_match_attr: str,
    r_match_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    inner_threshold: float = 0.9,
    inner: str = "jaro_winkler",
    weighting: str = "idf",
    comp_op: str = ">=",
) -> DataFrame:
    """Soft TF-IDF scorer (Cohen–Ravikumar–Fienberg 2003) over a candset.

    The classic hybrid ER measure: token weights come from corpus rarity
    (TF-IDF with set-semantics tf), token MATCHING is approximate — a left
    token contributes when its best jaro(-winkler) partner on the right
    clears ``inner_threshold``, weighted by both tokens' normalized
    weights and the inner similarity (see ``functions.sims.
    batch_soft_tfidf`` for the exact formula and fold orders). Catches
    "jon smith" vs "john smyth" where exact-token TF-IDF scores 0.

    ``weighting`` follows ``tfidf_cosine_join``: ``"idf"`` (smoothed
    log-idf, production) or ``"inv_df"`` (1/df — every arithmetic step is
    a correctly-rounded IEEE op, the cross-engine-exact oracle rule).
    Document frequencies are computed over the union of both inputs'
    non-null rows (a self-join counts rows twice — uniform across engines,
    and score-invariant: weights enter only normalized per side).

    Scale shape: one df aggregation; per-side weight-array assembly is
    explode → vocabulary join → collect sorted per key (shuffles keyed on
    the row key); the scorer itself is one Arrow-batched pass over the
    candset — the inner max-matching is unavoidable Python (Spark has no
    jaro builtin), kept off every join path: this operator only SCORES
    already-blocked pairs, exactly like apply_matcher.
    """
    import numpy as np

    from ..plans.validation import COMP_OP_NUMPY, validate_comp_op
    from ..functions.sims import batch_soft_tfidf

    validate_comp_op(comp_op, (">=", ">", "<=", "<", "=", "!="))
    if weighting not in ("idf", "inv_df"):
        raise AssertionError(f"unknown weighting {weighting!r}")
    validate_attr(candset, candset_l_key_attr, "candset")
    validate_attr(candset, candset_r_key_attr, "candset")
    validate_attr(ltable, l_key_attr, "left")
    validate_attr(rtable, r_key_attr, "right")
    validate_attr(ltable, l_match_attr, "left")
    validate_attr(rtable, r_match_attr, "right")

    toks_expr = F.array_sort(F.array_distinct(tokenizer.spark_col(F.col("_val"))))
    l_rows = _rows_df(ltable, l_key_attr, l_match_attr, "l").select(
        F.col("l_key").alias("_k"), toks_expr.alias("_toks")
    )
    r_rows = _rows_df(rtable, r_key_attr, r_match_attr, "r").select(
        F.col("r_key").alias("_k"), toks_expr.alias("_toks")
    )
    l_rows = l_rows.persist().transform(_tc)
    r_rows = r_rows.persist().transform(_tc)

    all_toks = l_rows.select(F.explode("_toks").alias("_tok")).unionAll(
        r_rows.select(F.explode("_toks").alias("_tok"))
    )
    df_tab = all_toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    if weighting == "idf":
        n_df = (
            l_rows.select(F.count(F.lit(1)).alias("_n"))
            .unionAll(r_rows.select(F.count(F.lit(1)).alias("_n")))
            .agg(F.sum("_n").cast("double").alias("_N"))
        )
        df_tab = df_tab.crossJoin(F.broadcast(n_df))
        w_expr = F.log(
            (F.col("_N") + F.lit(1.0)) / (F.col("_df").cast("double") + F.lit(1.0))
        ) + F.lit(1.0)
    else:
        w_expr = F.lit(1.0) / F.col("_df").cast("double")
    weights = df_tab.select("_tok", w_expr.alias("_w"))

    def side_arrays(rows: DataFrame, side: str) -> DataFrame:
        ex = rows.select("_k", F.explode("_toks").alias("_tok")).join(
            weights, "_tok"
        )
        arr = ex.groupBy("_k").agg(
            F.sort_array(F.collect_list(F.struct("_tok", "_w"))).alias("_tw")
        )
        return arr.select(
            F.col("_k").alias(f"__{side}k"),
            F.transform("_tw", lambda s: s["_tok"]).alias(f"__{side}t"),
            F.transform("_tw", lambda s: s["_w"]).alias(f"__{side}w"),
        )

    joined = candset.join(
        side_arrays(l_rows, "l"),
        candset[candset_l_key_attr] == F.col("__lk"),
        "left",
    ).join(
        side_arrays(r_rows, "r"),
        candset[candset_r_key_attr] == F.col("__rk"),
        "left",
    )

    from pyspark.sql import types as T

    cand_cols = candset.columns
    out_schema = T.StructType(
        list(candset.schema.fields) + [T.StructField("_sim_score", T.DoubleType())]
    )
    cmp = COMP_OP_NUMPY[comp_op]
    thr = float(threshold)
    ithr = float(inner_threshold)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lt = [None if t is None else list(t) for t in pdf["__lt"]]
            lw = [None if t is None else list(t) for t in pdf["__lw"]]
            rt = [None if t is None else list(t) for t in pdf["__rt"]]
            rw = [None if t is None else list(t) for t in pdf["__rw"]]
            scores = batch_soft_tfidf(lt, lw, rt, rw, ithr, inner)
            keep = cmp(scores, thr)
            out = pdf.loc[keep, cand_cols].copy()
            out["_sim_score"] = scores[np.asarray(keep)]
            yield out

    return joined.mapInPandas(fn, out_schema)
