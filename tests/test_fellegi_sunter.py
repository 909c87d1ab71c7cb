"""Fellegi–Sunter probabilistic linkage: EM recovery, level expressions,
literal-weight scoring parity, and end-to-end unsupervised linkage quality."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.operators.fellegi_sunter import (
    Comparison,
    agreement_vectors,
    em_fit,
    exact_comparison,
    fellegi_sunter_link,
    jaccard_comparison,
    levenshtein_comparison,
    match_weight_column,
    pattern_counts,
    score_pairs,
)


def _planted_counts(lam, m, u, n_total, rng):
    """Sample pattern counts from a known FS model (2 comparisons)."""
    K = len(m)
    counts = {}
    n_match = int(round(n_total * lam))
    for is_match, n in ((True, n_match), (False, n_total - n_match)):
        probs = m if is_match else u
        draws = np.stack(
            [rng.choice(len(probs[i]), size=n, p=probs[i]) for i in range(K)], axis=1
        )
        for row in draws:
            key = tuple(int(x) for x in row)
            counts[key] = counts.get(key, 0) + 1
    return list(counts.items())


def test_em_recovers_planted_parameters(spark):
    # NOTE: a 2-class latent model needs >= 3 conditionally-independent
    # indicators to be identifiable — FS pipelines always have them.
    rng = np.random.default_rng(42)
    lam = 0.2
    m = [
        np.array([0.05, 0.15, 0.80]),
        np.array([0.10, 0.90]),
        np.array([0.20, 0.80]),
    ]
    u = [
        np.array([0.70, 0.25, 0.05]),
        np.array([0.85, 0.15]),
        np.array([0.90, 0.10]),
    ]
    comps = [
        Comparison("a", 3, F.lit(0)),
        Comparison("b", 2, F.lit(0)),
        Comparison("c", 2, F.lit(0)),
    ]
    counts = _planted_counts(lam, m, u, 200_000, rng)
    params = em_fit(counts, comps, lam_init=0.5)
    assert params.converged
    assert params.lam == pytest.approx(lam, abs=0.02)
    assert np.allclose(params.m["a"], m[0], atol=0.02)
    assert np.allclose(params.u["a"], u[0], atol=0.02)
    assert np.allclose(params.m["b"], m[1], atol=0.02)
    assert np.allclose(params.u["b"], u[1], atol=0.02)
    # agreement weights: top level positive evidence, bottom negative
    wa = params.partial_weights("a")
    assert wa[2] > 0 > wa[0]


def test_em_rejects_bad_input(spark):
    comps = [Comparison("a", 2, F.lit(0))]
    with pytest.raises(ValueError, match="empty"):
        em_fit([], comps)
    with pytest.raises(ValueError, match="arity"):
        em_fit([((0, 1), 5)], comps)


def test_level_expressions(spark):
    df = spark.createDataFrame(
        [
            # l_s, r_s (levenshtein bands 0 / <=2 / else), l_e, r_e (exact)
            ("abc", "abc", "x", "x"),
            ("abc", "abd", "x", "y"),
            ("abc", "zzzzzz", "x", None),
            (None, "abc", None, None),
        ],
        "l_s string, r_s string, l_e string, r_e string",
    )
    comps = [
        levenshtein_comparison("s", "l_s", "r_s", thresholds=(0, 2)),
        exact_comparison("e", "l_e", "r_e"),
    ]
    got = [
        (r["_g_s"], r["_g_e"]) for r in agreement_vectors(df, comps).collect()
    ]
    # exact→2 / one-sub→1 / far (bounded kernel returns -1, must NOT match
    # a band) →0 / null→0; exact col: equal→1, differing/null→0
    assert got == [(2, 1), (1, 0), (0, 0), (0, 0)]


def test_jaccard_comparison_bands(spark):
    df = spark.createDataFrame(
        [
            (["a", "b"], ["a", "b"]),  # jac 1.0 → level 2
            (["a", "b", "c"], ["a", "b", "x"]),  # jac 0.5 → level 1
            (["a"], ["b"]),  # jac 0 → level 0
            (None, ["a"]),  # null → 0
        ],
        "l_t array<string>, r_t array<string>",
    )
    comp = jaccard_comparison("j", "l_t", "r_t", thresholds=(0.4, 0.8))
    got = [r["_g_j"] for r in agreement_vectors(df, [comp]).collect()]
    assert got == [2, 1, 0, 0]


def test_score_pairs_matches_numpy(spark):
    """The literal CASE-WHEN weight sum equals the numpy-computed sum."""
    from py_stringsimjoin_spark.operators.fellegi_sunter import FSParams

    comps = [
        Comparison("a", 3, F.lit(0)),
        Comparison("b", 2, F.lit(0)),
    ]
    params = FSParams(
        lam=0.25,
        m={"a": [0.1, 0.2, 0.7], "b": [0.2, 0.8]},
        u={"a": [0.6, 0.3, 0.1], "b": [0.9, 0.1]},
    )
    rows = [(ga, gb) for ga in range(3) for gb in range(2)]
    df = spark.createDataFrame(rows, "_g_a int, _g_b int")
    scored = score_pairs(df, comps, params)
    got = {
        (r["_g_a"], r["_g_b"]): (r["match_weight"], r["match_probability"])
        for r in scored.collect()
    }
    wa, wb = params.partial_weights("a"), params.partial_weights("b")
    for ga, gb in rows:
        w = wa[ga] + wb[gb] + params.prior_weight
        assert got[(ga, gb)][0] == w  # bit-exact literal sum
        assert got[(ga, gb)][1] == pytest.approx(2.0**w / (2.0**w + 1.0), rel=1e-12)


def test_end_to_end_unsupervised_linkage(spark):
    """Synthetic duplicates: FS separates matches from non-matches without
    labels, and the learned weights rank every true duplicate above every
    non-duplicate in the blocked candset."""
    import random

    rng = random.Random(11)
    first = ["anna", "bob", "carol", "dave", "erin", "frank", "grace", "hank"]
    last = ["smith", "jones", "patel", "kim", "lopez", "chen", "okafor", "mori"]
    cities = ["madison", "austin", "boulder", "ithaca"]
    rows, truth = [], set()
    rid = 0
    for i in range(160):
        # doubled-digit suffix: distinct records' first names differ by >= 2
        # edits, so only the planted one-char typos land in the <=1 band
        suffix = "".join(ch * 2 for ch in f"{i:03d}")
        f = rng.choice(first) + suffix
        l, c = rng.choice(last), rng.choice(cities)
        zipc = f"{53700 + rng.randint(0, 9)}"
        rows.append((rid, f, l, c, zipc))
        base = rid
        rid += 1
        if i % 4 == 0:  # one typo'd duplicate per 4th record
            fl = list(f)
            fl[rng.randrange(len(fl))] = "x"
            rows.append((rid, "".join(fl), l, c, zipc))
            truth.add((base, rid))
            rid += 1
    df = spark.createDataFrame(rows, "id int, first string, last string, city string, zip string")
    l = df.select(*[F.col(c).alias(f"l_{c}") for c in df.columns])
    r = df.select(*[F.col(c).alias(f"r_{c}") for c in df.columns])
    # block on last name (a realistic blocking key), dedup orientation
    pairs = l.join(r, (F.col("l_last") == F.col("r_last")) & (F.col("l_id") < F.col("r_id")))
    comps = [
        levenshtein_comparison("first", "l_first", "r_first", thresholds=(0, 1)),
        exact_comparison("city", "l_city", "r_city"),
        exact_comparison("zip", "l_zip", "r_zip"),
    ]
    scored, params = fellegi_sunter_link(pairs, comps, lam_init=0.3)
    assert params.converged
    got = {(r["l_id"], r["r_id"]): r["match_weight"] for r in scored.collect()}
    match_ws = [w for k, w in got.items() if k in truth]
    non_ws = [w for k, w in got.items() if k not in truth]
    assert len(match_ws) == len(truth)  # blocking kept every true pair
    assert min(match_ws) > max(non_ws)  # perfect separation on this data
    # probability-calibrated: thresholding at weight 0 gives F1 = 1.0 here
    pred = {k for k, w in got.items() if w > 0}
    assert pred == truth


def test_pattern_counts_tiny(spark):
    df = spark.createDataFrame(
        [(i % 3, i % 2) for i in range(1000)], "_g_a int, _g_b int"
    )
    comps = [Comparison("a", 3, F.lit(0)), Comparison("b", 2, F.lit(0))]
    pc = pattern_counts(df, comps).collect()
    assert len(pc) <= 6
    assert sum(r["n_pairs"] for r in pc) == 1000


def test_match_weight_column_prior_toggle(spark):
    from py_stringsimjoin_spark.operators.fellegi_sunter import FSParams

    comps = [Comparison("a", 2, F.lit(0))]
    params = FSParams(lam=0.5, m={"a": [0.3, 0.7]}, u={"a": [0.7, 0.3]})
    df = spark.createDataFrame([(1,)], "_g_a int")
    w_with = df.select(match_weight_column(comps, params).alias("w")).first()["w"]
    w_no = df.select(
        match_weight_column(comps, params, include_prior=False).alias("w")
    ).first()["w"]
    assert w_with == w_no + params.prior_weight  # prior at λ=0.5 is 0.0
    assert params.prior_weight == 0.0


def test_classify_pairs_bands(spark):
    from py_stringsimjoin_spark.operators.fellegi_sunter import classify_pairs

    df = spark.createDataFrame(
        [(1, 5.0), (2, 2.0), (3, -1.0), (4, -4.0), (5, 2.0 + 1e-12)],
        "id int, match_weight double",
    )
    out = classify_pairs(df, upper=2.0, lower=-1.0)
    got = {r["id"]: r["decision"] for r in out.collect()}
    assert got == {
        1: "match", 2: "match", 3: "nonmatch", 4: "nonmatch", 5: "match"
    }
    out2 = classify_pairs(df, upper=3.0, lower=-2.0)
    got2 = {r["id"]: r["decision"] for r in out2.collect()}
    assert got2 == {
        1: "match", 2: "possible", 3: "possible", 4: "nonmatch", 5: "possible"
    }
    with pytest.raises(ValueError, match="upper"):
        classify_pairs(df, upper=-1.0, lower=2.0)


def test_full_er_flow_blocking_fs_clustering_survivorship(spark):
    """End-to-end ER: phonetic blocking → FS link → decision bands →
    connected components → canonical record per cluster. Every stage is an
    existing operator; this guards the composition."""
    from py_stringsimjoin_spark.operators.canonical import canonicalize_clusters
    from py_stringsimjoin_spark.operators.connected_components import (
        connected_components,
    )
    from py_stringsimjoin_spark.operators.fellegi_sunter import classify_pairs
    from py_stringsimjoin_spark.operators.phonetic import soundex_blocking_pairs

    # three true entities, each with phonetically-alike variants
    rows = [
        (1, "Robert", "madison", "53703"),
        (2, "Rupert", "madison", "53703"),   # same sound, same city+zip → dup
        (3, "Ashcraft", "austin", "78701"),
        (4, "Ashcroft", "austin", "78701"),  # dup
        (5, "Tymczak", "boulder", "80301"),
        (6, "Robert", "austin", "73301"),    # same sound as 1/2, all else off
    ]
    df = spark.createDataFrame(rows, "id int, name string, city string, zip string")
    pairs = soundex_blocking_pairs(df, df, "id", "id", "name", "name").where(
        F.col("l_id") < F.col("r_id")
    )
    attrs = ["city", "zip"]
    l = df.select(F.col("id").alias("l_id"), *[F.col(a).alias(f"l_{a}") for a in attrs])
    r = df.select(F.col("id").alias("r_id"), *[F.col(a).alias(f"r_{a}") for a in attrs])
    pairs = pairs.join(l, "l_id").join(r, "r_id")
    comps = [
        exact_comparison("city", "l_city", "r_city"),
        exact_comparison("zip", "l_zip", "r_zip"),
    ]
    # fixed expert weights (too few pairs here for EM)
    from py_stringsimjoin_spark.operators.fellegi_sunter import FSParams, score_pairs
    from py_stringsimjoin_spark.operators.fellegi_sunter import agreement_vectors

    params = FSParams(
        lam=0.3,
        m={"city": [0.05, 0.95], "zip": [0.05, 0.95]},
        u={"city": [0.9, 0.1], "zip": [0.95, 0.05]},
    )
    scored = score_pairs(agreement_vectors(pairs, comps), comps, params)
    decided = classify_pairs(scored, upper=2.0, lower=0.0)
    matches = decided.where(F.col("decision") == "match")
    got_pairs = {(r["l_id"], r["r_id"]) for r in matches.collect()}
    assert got_pairs == {(1, 2), (3, 4)}  # (1,6)/(2,6) blocked but rejected

    cc = connected_components(matches.select(
        F.col("l_id").alias("src"), F.col("r_id").alias("dst"))
    ).withColumnRenamed("node", "id")
    canon = canonicalize_clusters(df, cc, "id", rank_attr="name")
    by_comp = {r["component"]: r for r in canon.collect()}
    # 2 merged clusters + 2 singletons (5 and 6) — singleton-complete output
    assert len(by_comp) == 4
    sizes = sorted(r["cluster_size"] for r in by_comp.values())
    assert sizes == [1, 1, 2, 2]
    # survivorship: longest name, ties broken by min id → 1 and 3
    merged_canon = {
        r["canonical_id"] for r in by_comp.values() if r["cluster_size"] == 2
    }
    assert merged_canon == {1, 3}


def test_em_degenerate_single_pattern(spark):
    """A single observed pattern gives one class all the mass; EM must not
    produce NaNs (the losing class keeps its previous distribution)."""
    comps = [Comparison("a", 2, F.lit(0)), Comparison("b", 2, F.lit(0)),
             Comparison("c", 2, F.lit(0))]
    params = em_fit([((1, 1, 1), 100)], comps, lam_init=0.5, max_iter=50)
    for name in ("a", "b", "c"):
        assert all(np.isfinite(params.m[name]))
        assert all(np.isfinite(params.u[name]))
    assert np.isfinite(params.lam)


def test_tf_adjustment(spark):
    """Rare-value agreement outranks common-value agreement; non-agreeing
    pairs are untouched (ratio 1.0, log2(1)=0)."""
    import math

    from py_stringsimjoin_spark.operators.fellegi_sunter import (
        FSParams,
        add_tf_adjustment,
        agreement_vectors,
        score_pairs,
        term_frequency_table,
    )

    # 8 smiths, 2 patels
    recs = spark.createDataFrame(
        [(i, "smith") for i in range(8)] + [(8, "patel"), (9, "patel")],
        "id int, last string",
    )
    tf = term_frequency_table(recs, "last")
    got_tf = {r["_tf_value"]: r["_tf"] for r in tf.collect()}
    assert got_tf == {"smith": 0.8, "patel": 0.2}

    comps = [exact_comparison("last", "l_last", "r_last")]
    params = FSParams(lam=0.2, m={"last": [0.1, 0.9]}, u={"last": [0.6, 0.4]})
    pairs = spark.createDataFrame(
        [(0, 1, "smith", "smith"), (8, 9, "patel", "patel"),
         (0, 8, "smith", "patel")],
        "l_id int, r_id int, l_last string, r_last string",
    )
    scored = score_pairs(agreement_vectors(pairs, comps), comps, params)
    adj = add_tf_adjustment(scored, comps[0], params, tf, "l_last")
    got = {(r["l_id"], r["r_id"]): r for r in adj.collect()}
    assert got[(0, 1)]["tf_ratio"] == 0.4 / 0.8
    assert got[(8, 9)]["tf_ratio"] == 0.4 / 0.2
    assert got[(0, 8)]["tf_ratio"] == 1.0
    # rare agreement now outweighs common agreement
    assert got[(8, 9)]["tf_adjusted_weight"] > got[(0, 1)]["tf_adjusted_weight"]
    # non-agreeing pair keeps its base weight exactly
    assert got[(0, 8)]["tf_adjusted_weight"] == got[(0, 8)]["match_weight"]
    # adjustment is log2 of the ratio
    w = got[(8, 9)]
    assert w["tf_adjusted_weight"] == pytest.approx(
        w["match_weight"] + math.log2(w["tf_ratio"]), rel=1e-12
    )
