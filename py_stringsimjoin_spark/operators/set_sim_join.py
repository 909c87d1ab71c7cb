"""Set-similarity joins (Jaccard / cosine / Dice) — the engine's core kernel.

Capability parity with the reference's jaccard/cosine/dice joins
(/root/reference/py_stringsimjoin/join/jaccard_join_py.py:17,
cosine_join_py.py:17, dice_join_py.py:17; shared kernel
join/set_sim_join.py:16-139) re-architected as one declarative Spark plan:

    tokenize (set) → global token ordering → ranked int arrays
    → prefix explode  ℓ(n) lowest-rank tokens          [filter §2.3]
    → hash equi-join on token rank                     [the "index"]
    → size-bound filter on (l_size, r_size)            [size filter]
    → groupBy pair, min-rank match → position bound    [position filter]
    → JVM array_intersect exact verify                 [zero UDF end-to-end]
    → empty-pair / missing-pair unions → output assembly

Catalyst/AQE notes: the token equi-join is the only large shuffle; hot
tokens are salted by measured frequency (plans/skew.py) and AQE skew join
covers the rest. The position bound and the final verify are plain column
arithmetic (JVM, whole-stage codegen — no Python anywhere in the plan).
Scores are float64, unrounded (the reference's default-Cython semantics,
set_sim_join_cy.pyx:132).
"""

from __future__ import annotations

import copy

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizers import Tokenizer
from ..plans import filter_math as fm
from ..plans.output import assemble_output
from ..plans.pairkey import resolve_pair_packer
from ..plans.stats import sample_plan_stats, value_hash_col
from ..plans.validation import (
    COMP_OP_FN,
    validate_attr,
    validate_attr_type,
    validate_comp_op,
    validate_output_attrs,
    validate_threshold,
    validate_tokenizer,
)
from .missing_pairs import missing_pairs
from .token_ordering import add_ranked_tokens, build_token_ordering
from ..plans.cache import tracked_cache as _tc
from ..plans.skew import (
    exploded_hot_token_ranks,
    hot_token_ranks,
    resolve_salt_parallelism,
    salted_token_join,
)

_EMPTY_OK = ("jaccard", "cosine", "dice", "overlap_coefficient")

_COMP_COL_FN = {
    ">=": lambda c, t: c >= t,
    ">": lambda c, t: c > t,
    "=": lambda c, t: c == t,
}


def _append_empty_and_missing(
    pairs, measure, comp_op, threshold, allow_empty, allow_missing,
    l_rk, r_rk, ltable, rtable, l_key_attr, r_key_attr,
    l_join_attr, r_join_attr, self_join_dedup, with_score,
):
    """Union the allow_empty (empty×empty, score 1.0) and allow_missing
    (NULL-attr cross pairs, NULL score) rows onto a pair result."""
    if allow_empty and measure in _EMPTY_OK and COMP_OP_FN[comp_op](1.0, threshold):
        l_empty = l_rk.where(F.col("_l_size") == 0).select("_l_key")
        r_empty = r_rk.where(F.col("_r_size") == 0).select("_r_key")
        empties = l_empty.crossJoin(r_empty)
        if self_join_dedup:
            empties = empties.where(F.col("_l_key") < F.col("_r_key"))
        if with_score:
            empties = empties.withColumn("_sim_score", F.lit(1.0).cast("double"))
        pairs = pairs.unionByName(empties)
    if allow_missing:
        mp = missing_pairs(
            ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr
        )
        if not with_score:
            mp = mp.select("_l_key", "_r_key")
        pairs = pairs.unionByName(mp)
    return pairs


def as_set_tokenizer(tokenizer: Tokenizer) -> Tokenizer:
    """Set-semantics copy (set-sim joins force return_set=True,
    jaccard_join_py.py:144-148)."""
    if tokenizer.return_set:
        return tokenizer
    t = copy.copy(tokenizer)
    t.return_set = True
    return t


def set_sim_join_pairs(
    measure: str,
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    comp_op: str = ">=",
    allow_empty: bool = True,
    allow_missing: bool = False,
    position_filter: bool = True,
    self_join_dedup: bool = False,
    verify: bool = True,
    strategy: str = "auto",
    value_dedup: bool | str = "auto",
    shuffle_partitions: int | None = None,
    _plan_stats: dict | None = None,
    _prepared=None,
    _join_rows_hint: int | None = None,
) -> DataFrame:
    """Core kernel → DataFrame(_l_key, _r_key, _sim_score).

    ``shuffle_partitions``: explicit partition count for the exploded token
    join (the plan's one large shuffle) — at full scale this stage wants far
    more partitions than the session default (SCALE_DESIGN.md prescribes
    ~10^6 at 10^12 docs so each task's join output stays executor-sized),
    while the rest of the query is fine at the session setting. ``None``
    inherits ``spark.sql.shuffle.partitions``. The value is pinned via an
    explicit ``repartition(n)`` so AQE cannot re-coalesce the expansion.

    ``self_join_dedup=True`` (self-join deduplication for clustering
    pipelines) keeps only _l_key < _r_key pairs, applied *before* the
    groupBy so the shuffle halves. ``verify=False`` stops after the
    filter stack and returns candidate pairs without scores (blocking
    mode; _sim_score column absent).

    ``strategy``: physical-plan choice, the engine's one cost-based
    decision (Catalyst can't see it — it's domain logic):
      * ``"prefix"``  — prefix-explode + filters + JVM array-intersect verify;
        wins when prefixes are much shorter than token sets (long texts,
        high thresholds).
      * ``"count"``   — explode ALL tokens, equi-join, groupBy-count =
        exact overlap, score as pure JVM arithmetic (zero UDF); wins when
        ℓ(n) ≈ n (short token sets / low thresholds), where the prefix
        plan pays its extra joins + Python stage for no pruning.
      * ``"auto"``    — picks between them from the shared bounded-sample
        stats job (plans/stats.sample_plan_stats; O(sample) cost at any
        corpus size): count when the prefix would keep >60% of tokens or
        sets average ≤4 tokens.

    ``value_dedup``: the second cost-based decision — dup-heavy corpora
    (re-crawled pages, repeated product names) make the row-level join
    quadratic in the duplicate count for no information: similarity is a
    function of the VALUE, not the row. When the distinct/total ratio of
    the join attrs drops below 0.6 (estimated by the same bounded-sample
    stats job — a limit() read, not a corpus scan),
    the join runs on distinct values only and the result is expanded back
    to rows by two equality joins — identical output, work shrinks by the
    duplication factor squared. ``True``/``False`` force the choice.
    """
    if measure == "overlap_coefficient":
        # the prefix/count kernels assume size-monotone bounds; OC has none —
        # its inverted-index plan lives in overlap_join.overlap_coefficient_join
        raise ValueError(
            "overlap_coefficient is not supported by set_sim_join_pairs; "
            "use operators.overlap_join.overlap_coefficient_join"
        )
    validate_attr(ltable, l_key_attr, "left")
    validate_attr(rtable, r_key_attr, "right")
    validate_attr(ltable, l_join_attr, "left")
    validate_attr(rtable, r_join_attr, "right")
    validate_attr_type(ltable, l_join_attr, "left")
    validate_attr_type(rtable, r_join_attr, "right")
    validate_tokenizer(tokenizer)
    validate_threshold(threshold, measure)
    validate_comp_op(comp_op, (">=", ">", "="))
    tok = as_set_tokenizer(tokenizer)

    l_proj = ltable.select(
        F.col(l_key_attr).alias("_l_key"), F.col(l_join_attr).alias("_l_str")
    )
    r_proj = rtable.select(
        F.col(r_key_attr).alias("_r_key"), F.col(r_join_attr).alias("_r_str")
    )
    # tokenize + the ordering/ranked-table partial aggs run before the first
    # exchange — widen a narrow scan (plans/layout.py; no-op at production
    # split counts)
    from ..plans.layout import widen_small_scan

    l_nn = widen_small_scan(l_proj.where(F.col("_l_str").isNotNull())).withColumn(
        "_tokens", tok.spark_col(F.col("_l_str"))
    )
    # self-join detection: same table object + same attrs → tokenize, build
    # the ordering, and rank ONCE; the right side is an alias of the left
    # cache (halves the prep work for clustering/dedup pipelines)
    is_self = ltable is rtable and l_key_attr == r_key_attr and l_join_attr == r_join_attr

    if _prepared is not None:
        # prepared self-corpus (operators/prepared.py): the ordering and the
        # ranked arrays are reused as-is — tokenize / ordering-build / rank
        # all skipped. Row-level by construction (prepare over a distinct-
        # value table yourself if your corpus is dup-heavy).
        if not is_self:
            raise ValueError("prepared corpora support self-joins only")
        value_dedup = False
        if _plan_stats is None:
            _plan_stats = _prepared.stats

    # All three plan-time decisions (value dedup, prefix-vs-count strategy,
    # inline-vs-rejoin verify) share ONE bounded-sample stats job
    # (plans/stats.sample_plan_stats), computed lazily on first need and
    # passed down to the value-dedup recursion so it is never repeated.
    plan_stats = _plan_stats

    def get_stats() -> dict:
        nonlocal plan_stats
        if plan_stats is None:
            sides = [(l_proj, "_l_str")]
            if not is_self:
                sides.append((r_proj, "_r_str"))
            plan_stats = sample_plan_stats(
                sides,
                tokenizer=tok,
                prefix_col_fn=lambda sz: fm.prefix_length_col(sz, measure, threshold),
            )
        return plan_stats

    if value_dedup == "auto":
        st = get_stats()
        value_dedup = st["n"] > 0 and st["nd"] / st["n"] < 0.6
    if value_dedup:
        lv = l_proj.where(F.col("_l_str").isNotNull()).select(
            F.col("_l_str").alias("_v")
        ).distinct()
        rv = lv if is_self else r_proj.where(F.col("_r_str").isNotNull()).select(
            F.col("_r_str").alias("_v")
        ).distinct()
        # expansion back to rows joins on the 16-byte md5 content key, not
        # the raw join-attr text — fixed-width shuffle keys at any doc size
        vp = set_sim_join_pairs(
            measure, lv, rv, "_v", "_v", "_v", "_v", tokenizer, threshold,
            comp_op, allow_empty, allow_missing=False,
            position_filter=position_filter, self_join_dedup=False,
            verify=verify, strategy=strategy, value_dedup=False,
            shuffle_partitions=shuffle_partitions, _plan_stats=plan_stats,
            # the inner join's row count is the DISTINCT-value count, not the
            # corpus row count — pass it so the tiny-join gate below can skip
            # the salt probe + exchange pinning for e.g. a 64-value join
            _join_rows_hint=plan_stats["nd"] if plan_stats else None,
        ).select(
            value_hash_col(F.col("_l_key")).alias("_h1"),
            value_hash_col(F.col("_r_key")).alias("_h2"),
            *([F.col("_sim_score")] if verify else []),
        )
        l_hm = l_proj.where(F.col("_l_str").isNotNull()).select(
            "_l_key", value_hash_col(F.col("_l_str")).alias("_hl")
        )
        r_hm = r_proj.where(F.col("_r_str").isNotNull()).select(
            "_r_key", value_hash_col(F.col("_r_str")).alias("_hr")
        )
        out = (
            vp.join(l_hm, F.col("_h1") == F.col("_hl"))
            .join(r_hm, F.col("_h2") == F.col("_hr"))
            .select("_l_key", "_r_key", *(["_sim_score"] if verify else []))
        )
        if self_join_dedup:
            out = out.where(F.col("_l_key") < F.col("_r_key"))
        if allow_missing:
            mp = missing_pairs(
                ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr
            )
            if not verify:
                mp = mp.select("_l_key", "_r_key")
            out = out.unionByName(mp)
        return out
    if _prepared is not None:
        ordering = _prepared.ordering
        l_rk = _prepared.ranked
        r_rk = l_rk.select(
            F.col("_l_key").alias("_r_key"),
            F.col("_l_ranked").alias("_r_ranked"),
            F.col("_l_size").alias("_r_size"),
        )
    elif is_self:
        ordering = build_token_ordering([(l_nn, "_tokens")]).persist().transform(_tc)
        l_rk = add_ranked_tokens(
            l_nn, ["_l_key"], "_tokens", ordering, "_l_ranked", "_l_size"
        ).select("_l_key", "_l_ranked", "_l_size").persist().transform(_tc)
        r_rk = l_rk.select(
            F.col("_l_key").alias("_r_key"),
            F.col("_l_ranked").alias("_r_ranked"),
            F.col("_l_size").alias("_r_size"),
        )
    else:
        r_nn = widen_small_scan(
            r_proj.where(F.col("_r_str").isNotNull())
        ).withColumn("_tokens", tok.spark_col(F.col("_r_str")))
        ordering = build_token_ordering([(l_nn, "_tokens"), (r_nn, "_tokens")]).persist().transform(_tc)
        l_rk = add_ranked_tokens(
            l_nn, ["_l_key"], "_tokens", ordering, "_l_ranked", "_l_size"
        ).select("_l_key", "_l_ranked", "_l_size").persist().transform(_tc)
        r_rk = add_ranked_tokens(
            r_nn, ["_r_key"], "_tokens", ordering, "_r_ranked", "_r_size"
        ).select("_r_key", "_r_ranked", "_r_size").persist().transform(_tc)

    if strategy not in ("auto", "prefix", "count"):
        raise AssertionError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        st = get_stats()
        avg_size = st["avg_size"]
        avg_pfx = st["avg_pfx"]
        # Count wins only when its one advantage — narrow rows through the
        # token-join exchange instead of ranked arrays — is material, i.e.
        # wide sets at low thresholds (prefix ≈ full set AND arrays ≫ the
        # narrow row). For short sets prefix+inline-verify dominates
        # structurally: its post-join hash state is the VERIFIED matches
        # (a subset of count's candidate-pair agg state, 15× smaller on the
        # dup-heavy x2 part kernel) and the position filter prunes joined
        # rows inside codegen. Measured sf0.1 local[16], x2 part rowlevel:
        # prefix 30.5s vs count ~42s — the pre-round-4 rule (count whenever
        # avg_size ≤ 4) dated from the mapInPandas verify era, when prefix
        # paid a Python stage per candidate; the inline JVM array_intersect
        # removed that cost entirely.
        strategy = (
            "count"
            if avg_size > 8 and avg_pfx / avg_size > 0.6
            else "prefix"
        )

    n_shuffle = shuffle_partitions or int(
        ltable.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    n_salts = resolve_salt_parallelism(ltable, n_shuffle)
    # Tiny-join gate: when the join input is provably small (the value-dedup
    # recursion passes the distinct-value count; otherwise the already-paid
    # sampled stats), skip the hot-token probe job and the exchange pinning —
    # salting/pinning protect an EXPLODING join's balance, and below this row
    # count even the worst-case single-bucket join is sub-second while the
    # probe job + two pinned exchanges dominate the query. Never pays a new
    # job: with no hint and no stats the full probe path runs as before.
    # ``spark.py_stringsimjoin.saltProbeMinRows`` (default 4096) tunes it;
    # 0 disables the gate.
    probe_min = int(
        ltable.sparkSession.conf.get("spark.py_stringsimjoin.saltProbeMinRows", "4096")
    )
    est_rows = _join_rows_hint
    if est_rows is None and plan_stats is not None:
        est_rows = plan_stats.get("n")
    tiny_join = est_rows is not None and 0 < est_rows < probe_min
    pin_n = None if tiny_join else n_shuffle
    if tiny_join:
        hot = {}
    elif strategy == "count":
        # full-token explode: the global ordering frequencies ARE the join
        # stream frequencies, so the zero-job global rule is exact here
        hot = hot_token_ranks(ordering, n_salts)
    else:
        # prefix explode keeps each record's RAREST tokens — hotness must be
        # measured on the prefix stream itself or templated near-dup corpora
        # serialize the join into one bucket (plans/skew.
        # exploded_hot_token_ranks; measured 29.8s -> fair-share tasks on
        # jaccard_docs sf0.1)
        probe = l_rk.withColumn(
            "_pfx", fm.prefix_length_col(F.col("_l_size"), measure, threshold)
        ).select(F.explode(F.expr("slice(_l_ranked, 1, _pfx)")).alias("_tok"))
        if not is_self and _prepared is None:
            probe = probe.unionByName(
                r_rk.withColumn(
                    "_pfx",
                    fm.prefix_length_col(F.col("_r_size"), measure, threshold),
                ).select(F.explode(F.expr("slice(_r_ranked, 1, _pfx)")).alias("_tok"))
            )
        hot = exploded_hot_token_ranks(probe, n_salts)
    # Every strategy ends in a hash aggregation keyed by the candidate pair
    # (groupBy / distinct) — the plan's spill-dominant stage on dup-heavy
    # corpora. When both keys provably fit in 32 bits the pair is packed
    # into ONE primitive long through that aggregation (plans/pairkey.py;
    # round-3 event logs measured the two-column grouping key spilling
    # 4-8× its exchange bytes).
    # prepared corpora cache the packer decision (its bounds job is a corpus
    # property — a threshold sweep must not re-pay the scan per call)
    if _prepared is not None:
        packer = _prepared.resolve_packer()
    else:
        packer = resolve_pair_packer(ltable, rtable, l_key_attr, r_key_attr, is_self)

    if strategy == "count":
        ex_l = l_rk.select("_l_key", "_l_size", F.explode("_l_ranked").alias("_tok"))
        ex_r = r_rk.select("_r_key", "_r_size", F.explode("_r_ranked").alias("_tok"))
        joined = salted_token_join(
            ex_l, ex_r, hot, n_salts, "_l_key", pin_partitions=pin_n
        ).where(
            (F.col("_r_size") >= fm.size_lower_bound_col(F.col("_l_size"), measure, threshold))
            & (F.col("_r_size") <= fm.size_upper_bound_col(F.col("_l_size"), measure, threshold))
        )
        if self_join_dedup:
            joined = joined.where(F.col("_l_key") < F.col("_r_key"))
        if packer is not None:
            # sizes are functionally dependent on their key, so min() over
            # the packed (l_size << 32 | r_size) long IS (min_ls, min_rs);
            # the whole agg state is two primitive longs per group
            szs = F.shiftleft(F.col("_l_size").cast("long"), 32).bitwiseOR(
                F.col("_r_size").cast("long")
            )
            grouped = (
                joined.groupBy(
                    packer.pack(F.col("_l_key"), F.col("_r_key")).alias("_pk")
                )
                .agg(F.count("*").alias("_ov"), F.min(szs).alias("_szs"))
                .select(
                    packer.unpack_l(F.col("_pk")).alias("_l_key"),
                    packer.unpack_r(F.col("_pk")).alias("_r_key"),
                    "_ov",
                    F.shiftright(F.col("_szs"), 32).cast("int").alias("_ls"),
                    F.shiftright(F.shiftleft(F.col("_szs"), 32), 32)
                    .cast("int")
                    .alias("_rs"),
                )
            )
        else:
            grouped = joined.groupBy("_l_key", "_r_key").agg(
                F.count("*").alias("_ov"),
                F.min("_l_size").alias("_ls"),
                F.min("_r_size").alias("_rs"),
            )
        ov = F.col("_ov").cast("double")
        ls = F.col("_ls").cast("double")
        rs = F.col("_rs").cast("double")
        if measure == "jaccard":
            score = ov / (ls + rs - ov)
        elif measure == "cosine":
            score = ov / F.sqrt(ls * rs)
        elif measure == "dice":
            score = F.lit(2.0) * ov / (ls + rs)
        else:
            raise AssertionError(measure)
        pairs = (
            grouped.withColumn("_sim_score", score)
            .where(_COMP_COL_FN[comp_op](F.col("_sim_score"), F.lit(threshold)))
            .select("_l_key", "_r_key", "_sim_score")
        )
        if not verify:
            pairs = pairs.select("_l_key", "_r_key")
        pairs = _append_empty_and_missing(
            pairs, measure, comp_op, threshold, allow_empty, allow_missing,
            l_rk, r_rk, ltable, rtable, l_key_attr, r_key_attr,
            l_join_attr, r_join_attr, self_join_dedup, with_score=verify,
        )
        return pairs

    # Verify placement decision (only when verifying): on SHORT token sets
    # the ranked arrays ride through the prefix explode and the
    # array_intersect verify runs INLINE in the join stage, so the only
    # post-join shuffle is the distinct over VERIFIED matches. On dense /
    # dup-heavy corpora the raw joined stream is 3-10× the verified match
    # count, and round-3 measured the candidate distinct + the two
    # array-rejoin shuffles as the dominant (spill-bound, non-scaling) cost.
    # For LONG token sets (arrays expensive to replicate prefix-length times
    # through the exchange) the classic candidates-distinct → rejoin-arrays
    # plan is kept. 64 tokens ≈ the break-even between array-replication
    # bytes (corpus × prefix × setsize) and candidate-shuffle bytes.
    inline_verify = False
    if verify:
        inline_verify = get_stats()["avg_size"] <= 64

    pl = (
        l_rk.withColumn(
            "_pfx", fm.prefix_length_col(F.col("_l_size"), measure, threshold)
        )
        .select(
            "_l_key",
            "_l_size",
            *(["_l_ranked"] if inline_verify else []),
            F.posexplode(F.expr("slice(_l_ranked, 1, _pfx)")).alias("_l_pos", "_tok"),
        )
    )
    pr = (
        r_rk.withColumn(
            "_pfx", fm.prefix_length_col(F.col("_r_size"), measure, threshold)
        )
        .select(
            "_r_key",
            "_r_size",
            *(["_r_ranked"] if inline_verify else []),
            F.posexplode(F.expr("slice(_r_ranked, 1, _pfx)")).alias("_r_pos", "_tok"),
        )
    )

    joined = salted_token_join(
        pl, pr, hot, n_salts, "_l_key", pin_partitions=pin_n
    ).where(
        (F.col("_r_size") >= fm.size_lower_bound_col(F.col("_l_size"), measure, threshold))
        & (F.col("_r_size") <= fm.size_upper_bound_col(F.col("_l_size"), measure, threshold))
    )
    if self_join_dedup:
        joined = joined.where(F.col("_l_key") < F.col("_r_key"))

    if position_filter:
        # positional overlap upper bound evaluated PER JOINED ROW, before any
        # aggregation: for a shared token at positions (lp, rp),
        # overlap ≤ count_so_far + min(remaining) and the min-rank shared
        # token attains the MAXIMUM of this bound over a pair's rows — so
        # "pair passes at its min-rank token" ⟺ "any row passes". Filtering
        # rows first keeps the whole prune inside whole-stage codegen and
        # shrinks the distinct() that follows by ~an order of magnitude
        # (no groupBy over the full joined stream at all).
        ub = F.lit(1) + F.least(
            F.col("_l_size") - F.col("_l_pos") - 1,
            F.col("_r_size") - F.col("_r_pos") - 1,
        )
        joined = joined.where(
            ub >= fm.overlap_threshold_col(
                F.col("_l_size"), F.col("_r_size"), measure, threshold
            )
        )
    def _distinct_pairs(df):
        """distinct() over candidate pairs, through the packed key when
        available (one primitive long instead of a two-column UnsafeRow)."""
        if packer is None:
            return df.select("_l_key", "_r_key").distinct()
        return (
            df.select(packer.pack(F.col("_l_key"), F.col("_r_key")).alias("_pk"))
            .distinct()
            .select(
                packer.unpack_l(F.col("_pk")).alias("_l_key"),
                packer.unpack_r(F.col("_pk")).alias("_r_key"),
            )
        )

    if not verify:
        cand = _distinct_pairs(joined)
        return _append_empty_and_missing(
            cand, measure, comp_op, threshold, allow_empty, allow_missing,
            l_rk, r_rk, ltable, rtable, l_key_attr, r_key_attr,
            l_join_attr, r_join_attr, self_join_dedup, with_score=False,
        )

    # exact verify in pure JVM: the ranked arrays are duplicate-free ints, so
    # array_intersect size IS the set overlap; the score arithmetic matches
    # the count strategy's (identical IEEE-754 double ops → oracle parity).
    # No Arrow transfer, no Python workers — whole-stage codegen end to end.
    # (The previous mapInPandas verify spent ~95% of its wall time
    # serializing the candidate arrays to Python: 6.1M pairs ≈ 130 s vs ~10 s
    # JVM-side, measured at sf0.1.)
    if inline_verify:
        verify_in = joined
    else:
        cand = _distinct_pairs(joined)
        verify_in = cand.join(l_rk.select("_l_key", "_l_ranked"), "_l_key").join(
            r_rk.select("_r_key", "_r_ranked"), "_r_key"
        ).select("_l_key", "_r_key", "_l_ranked", "_r_ranked")

    ov = F.size(F.array_intersect("_l_ranked", "_r_ranked")).cast("double")
    ls = F.size("_l_ranked").cast("double")
    rs = F.size("_r_ranked").cast("double")
    if measure == "jaccard":
        score = ov / (ls + rs - ov)
    elif measure == "cosine":
        score = ov / F.sqrt(ls * rs)
    elif measure == "dice":
        score = F.lit(2.0) * ov / (ls + rs)
    else:
        raise AssertionError(measure)
    pairs = (
        verify_in.withColumn("_sim_score", score)
        .where(_COMP_COL_FN[comp_op](F.col("_sim_score"), F.lit(threshold)))
        .select("_l_key", "_r_key", "_sim_score")
    )
    if inline_verify:
        # duplicates (one per shared prefix token that survived the filters)
        # carry identical scores; dedup the verified matches
        if packer is not None:
            pairs = (
                pairs.select(
                    packer.pack(F.col("_l_key"), F.col("_r_key")).alias("_pk"),
                    "_sim_score",
                )
                .distinct()
                .select(
                    packer.unpack_l(F.col("_pk")).alias("_l_key"),
                    packer.unpack_r(F.col("_pk")).alias("_r_key"),
                    "_sim_score",
                )
            )
        else:
            pairs = pairs.distinct()
    return _append_empty_and_missing(
        pairs, measure, comp_op, threshold, allow_empty, allow_missing,
        l_rk, r_rk, ltable, rtable, l_key_attr, r_key_attr,
        l_join_attr, r_join_attr, self_join_dedup, with_score=True,
    )


def set_sim_join(
    measure: str,
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    comp_op: str = ">=",
    allow_empty: bool = True,
    allow_missing: bool = False,
    l_out_attrs=None,
    r_out_attrs=None,
    l_out_prefix: str = "l_",
    r_out_prefix: str = "r_",
    out_sim_score: bool = True,
    add_dense_id: bool | None = None,
    position_filter: bool = True,
    strategy: str = "auto",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    validate_output_attrs(l_out_attrs, r_out_attrs, ltable.columns, rtable.columns)
    pairs = set_sim_join_pairs(
        measure,
        ltable,
        rtable,
        l_key_attr,
        r_key_attr,
        l_join_attr,
        r_join_attr,
        tokenizer,
        threshold,
        comp_op,
        allow_empty,
        allow_missing,
        position_filter,
        strategy=strategy,
        shuffle_partitions=shuffle_partitions,
    )
    return assemble_output(
        pairs,
        ltable,
        rtable,
        l_key_attr,
        r_key_attr,
        l_out_attrs,
        r_out_attrs,
        l_out_prefix,
        r_out_prefix,
        "_sim_score" if out_sim_score else None,
        add_dense_id,
    )


def jaccard_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr, tokenizer, threshold, **kw):
    """J(tok(l), tok(r)) comp_op threshold  (jaccard_join_py.py:17)."""
    return set_sim_join("jaccard", ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr, tokenizer, threshold, **kw)


def cosine_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr, tokenizer, threshold, **kw):
    """|∩|/√(|X||Y|) comp_op threshold  (cosine_join_py.py:17)."""
    return set_sim_join("cosine", ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr, tokenizer, threshold, **kw)


def dice_join(ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr, tokenizer, threshold, **kw):
    """2|∩|/(|X|+|Y|) comp_op threshold  (dice_join_py.py:17)."""
    return set_sim_join("dice", ltable, rtable, l_key_attr, r_key_attr, l_join_attr, r_join_attr, tokenizer, threshold, **kw)
