"""tfidf_cosine_join + canonicalize_clusters vs hand/pure-Python oracles."""

import math

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.canonical import canonicalize_clusters
from py_stringsimjoin_spark.operators.weighted import tfidf_cosine_join

DOCS = [
    (1, "red apple pie"),
    (2, "red apple tart"),
    (3, "green apple pie"),
    (4, "blue whale song"),
    (5, "red apple pie"),
    (6, None),
    (7, ""),
]


def _python_weighted_cosine(rows, weighting):
    """Pure-Python mirror: set-tf, df over BOTH sides of the self-join
    (each doc counted twice), sorted-token sequential sums."""
    docs = {i: sorted(set(s.split())) for i, s in rows if s and s.split()}
    df = {}
    for toks in docs.values():
        for t in toks:
            df[t] = df.get(t, 0) + 2  # self-join: both sides contribute
    n = 2 * len(docs)
    if weighting == "idf":
        w = {t: math.log((n + 1.0) / (d + 1.0)) + 1.0 for t, d in df.items()}
    else:
        w = {t: 1.0 / d for t, d in df.items()}
    norm = {}
    for i, toks in docs.items():
        acc = 0.0
        for t in toks:  # sorted order
            acc += w[t] * w[t]
        norm[i] = math.sqrt(acc)
    out = {}
    for i, ti in docs.items():
        for j, tj in docs.items():
            shared = sorted(set(ti) & set(tj))
            if not shared:
                continue
            dot = 0.0
            for t in shared:
                dot += w[t] * w[t]
            out[(i, j)] = dot / (norm[i] * norm[j])
    return out


@pytest.mark.parametrize("weighting", ["idf", "inv_df"])
def test_tfidf_cosine_self_join_matches_python(spark, weighting):
    df = spark.createDataFrame(DOCS, ["id", "txt"])
    out = tfidf_cosine_join(
        df, df, "id", "id", "txt", "txt", WhitespaceTokenizer(),
        threshold=0.1, weighting=weighting, exact_order=True,
    ).collect()
    expected = {k: v for k, v in _python_weighted_cosine(DOCS, weighting).items() if v >= 0.1}
    got = {(r.l_key, r.r_key): r.sim for r in out}
    assert set(got) == set(expected)
    for k in expected:
        if weighting == "inv_df":
            assert got[k] == expected[k], k  # IEEE-exact path
        else:
            assert abs(got[k] - expected[k]) < 1e-12, k


def test_tfidf_fast_path_agrees_with_exact_order(spark):
    df = spark.createDataFrame(DOCS, ["id", "txt"])
    kw = dict(tokenizer=WhitespaceTokenizer(), threshold=0.3, weighting="idf")
    fast = tfidf_cosine_join(df, df, "id", "id", "txt", "txt", **kw).collect()
    exact = tfidf_cosine_join(
        df, df, "id", "id", "txt", "txt", exact_order=True, **kw
    ).collect()
    f = {(r.l_key, r.r_key): r.sim for r in fast}
    e = {(r.l_key, r.r_key): r.sim for r in exact}
    assert set(f) == set(e)
    for k in f:
        assert abs(f[k] - e[k]) < 1e-9


def test_tfidf_value_dedup_identical_output(spark):
    # duplicate-heavy attr: the value-dedup plan (score distinct values,
    # expand via md5 keys) must match the row-level plan bit for bit
    rows = [(i, ["red apple pie", "red apple tart", "blue whale song"][i % 3])
            for i in range(30)] + [(100, "green apple"), (101, None)]
    df = spark.createDataFrame(rows, ["id", "txt"])
    kw = dict(tokenizer=WhitespaceTokenizer(), threshold=0.2,
              weighting="inv_df", exact_order=True)
    plain = tfidf_cosine_join(df, df, "id", "id", "txt", "txt", **kw).collect()
    dedup = tfidf_cosine_join(
        df, df, "id", "id", "txt", "txt", value_dedup=True, **kw
    ).collect()
    p = {(r.l_key, r.r_key): r.sim for r in plain}
    d = {(r.l_key, r.r_key): r.sim for r in dedup}
    assert p == d and len(p) > 100


def test_tfidf_weights_rarity_over_stopwords(spark):
    # docs sharing only the ubiquitous token score far below docs sharing
    # the rare one — the point of weighting
    rows = [
        (1, "common rare1"),
        (2, "common rare1"),
        (3, "common other"),
    ]
    df = spark.createDataFrame(rows, ["id", "txt"])
    out = tfidf_cosine_join(
        df, df, "id", "id", "txt", "txt", WhitespaceTokenizer(),
        threshold=0.0001, weighting="idf",
    ).collect()
    sims = {(r.l_key, r.r_key): r.sim for r in out}
    assert sims[(1, 2)] > sims[(1, 3)]
    assert sims[(1, 1)] == pytest.approx(1.0)


RECORDS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta"),
    (3, "alpha"),
    (4, "delta"),
    (5, None),
]
CLUSTERS = [(1, 10), (2, 10), (3, 10)]


def test_canonicalize_longest(spark):
    rec = spark.createDataFrame(RECORDS, ["id", "txt"])
    clu = spark.createDataFrame(CLUSTERS, ["id", "component"])
    out = canonicalize_clusters(
        rec, clu, "id", "component", rank_attr="txt",
        strategy="longest", keep_attrs=["txt"],
    ).collect()
    by_c = {r.component: r for r in out}
    assert by_c[10].canonical_id == 1 and by_c[10].cluster_size == 3
    assert by_c[10].txt == "alpha beta gamma"
    # singletons surface as their own cluster
    assert by_c[4].canonical_id == 4 and by_c[4].cluster_size == 1
    assert by_c[5].canonical_id == 5  # null rank_attr still canonicalizes
    assert len(out) == 3


def test_canonicalize_min_max_id(spark):
    rec = spark.createDataFrame(RECORDS, ["id", "txt"])
    clu = spark.createDataFrame(CLUSTERS, ["id", "component"])
    lo = {r.component: r.canonical_id for r in canonicalize_clusters(
        rec, clu, "id", "component", strategy="min_id").collect()}
    hi = {r.component: r.canonical_id for r in canonicalize_clusters(
        rec, clu, "id", "component", strategy="max_id").collect()}
    assert lo[10] == 1 and hi[10] == 3


def test_canonicalize_validation(spark):
    rec = spark.createDataFrame(RECORDS, ["id", "txt"])
    clu = spark.createDataFrame(CLUSTERS, ["id", "component"])
    with pytest.raises(AssertionError):
        canonicalize_clusters(rec, clu, "id", "component", strategy="longest")
    with pytest.raises(AssertionError):
        canonicalize_clusters(rec, clu, "id", "component", strategy="nope")
    with pytest.raises(AssertionError):
        tfidf_cosine_join(
            rec, rec, "id", "id", "txt", "txt", WhitespaceTokenizer(),
            threshold=0.5, weighting="bm25",
        )


def test_golden_record_fusion(spark):
    """Attribute-level majority vote: modal non-null value per (cluster,
    attr); count ties break to the smallest value; nulls never win; int
    attrs come back as ints; singletons fuse to themselves."""
    from py_stringsimjoin_spark.operators.canonical import golden_record

    rec = spark.createDataFrame(
        [
            (1, "ACME", 10),
            (2, "ACME", 20),
            (3, "Acme Corp", 20),
            (4, None, None),       # nulls don't vote
            (5, "Zeta", 7),        # singleton (no cluster row)
        ],
        ["id", "brand", "size"],
    )
    clu = spark.createDataFrame([(1, 100), (2, 100), (3, 100), (4, 100)],
                                ["id", "component"])
    out = {r.component: r for r in golden_record(
        rec, clu, "id", ["brand", "size"], "component").collect()}
    assert out[100].cluster_size == 4
    assert out[100].brand == "ACME"          # 2 votes vs 1
    assert out[100].size == 20               # 2 votes vs 1
    assert out[5].cluster_size == 1 and out[5].brand == "Zeta" and out[5].size == 7
    assert isinstance(out[100].size, int)    # cast back to original type
    assert len(out) == 2


def test_golden_record_tie_breaks_to_smallest(spark):
    from py_stringsimjoin_spark.operators.canonical import golden_record

    rec = spark.createDataFrame(
        [(1, "beta"), (2, "alpha"), (3, "beta"), (4, "alpha")], ["id", "v"]
    )
    clu = spark.createDataFrame([(i, 9) for i in (1, 2, 3, 4)], ["id", "component"])
    out = golden_record(rec, clu, "id", ["v"], "component").collect()
    assert len(out) == 1 and out[0].v == "alpha"  # 2-2 tie -> smallest value


def test_golden_record_all_null_attr(spark):
    from py_stringsimjoin_spark.operators.canonical import golden_record

    rec = spark.createDataFrame([(1, None), (2, None)], "id long, v string")
    clu = spark.createDataFrame([(1, 5), (2, 5)], ["id", "component"])
    out = golden_record(rec, clu, "id", ["v"], "component").collect()
    assert len(out) == 1 and out[0].v is None and out[0].cluster_size == 2
