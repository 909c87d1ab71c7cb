"""Learned LR matcher: end-to-end featurize -> train -> score -> cluster."""

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.learned import score_matches, train_matcher
from py_stringsimjoin_spark.operators.matcher import featurize_pairs

WS = WhitespaceTokenizer(return_set=True)


def _toy_corpus(spark, n_clusters=30):
    """Deterministic synthetic people: each cluster has a clean record, a
    typo'd duplicate, and the corpus has unrelated records."""
    rows = []
    for i in range(n_clusters):
        base = f"person{i:03d} lives on street{i:03d} in town{i % 7}"
        typo = base.replace("street", "stret")  # 1-char deletion
        rows.append((2 * i, base, 1 if i % 3 else None))
        rows.append((2 * i + 1, typo, 1))
    for j in range(n_clusters):
        rows.append((1000 + j, f"company{j:03d} sells widget{j:03d} kind{j % 5}", 0))
    return spark.createDataFrame(rows, "id int, text string, junk int")


@pytest.fixture(scope="module")
def scored(spark):
    df = _toy_corpus(spark)
    # candidates: all same-parity-free pairs sharing a token (cheap blocking)
    tok = df.select("id", F.explode(WS.spark_col(F.col("text"))).alias("t"))
    cand = (
        tok.alias("a")
        .join(tok.alias("b"), "t")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("l_id"), F.col("b.id").alias("r_id"))
        .distinct()
    )
    feats = featurize_pairs(
        cand, "l_id", "r_id", df, df, "id", "id",
        {
            "jacc": {"l_attr": "text", "r_attr": "text", "tokenizer": WS, "measure": "jaccard"},
            "jw": {"l_attr": "text", "r_attr": "text", "measure": "jaro_winkler"},
            "edit": {"l_attr": "text", "r_attr": "text", "measure": "edit_distance"},
        },
    )
    # gold: the planted duplicate pairs (2i, 2i+1)
    labeled = feats.withColumn(
        "label",
        (
            (F.col("r_id") == F.col("l_id") + 1) & (F.col("l_id") % 2 == 0)
            & (F.col("l_id") < 1000)
        ).cast("double"),
    )
    model = train_matcher(labeled, ["jacc", "jw", "edit"], "label")
    out = score_matches(model, feats, ["jacc", "jw", "edit"])
    return labeled, out


def test_probabilities_valid_and_columns(scored):
    _, out = scored
    rows = out.collect()
    assert "match_prob" in out.columns
    assert all(0.0 <= r.match_prob <= 1.0 for r in rows)
    # original feature values survive untouched (no 0-fill leak)
    assert set(out.columns) == {"l_id", "r_id", "jacc", "jw", "edit", "match_prob"}


def test_separable_truth_recovered(scored):
    labeled, out = scored
    gold = {
        (r.l_id, r.r_id) for r in labeled.where(F.col("label") == 1.0).collect()
    }
    pred = {
        (r.l_id, r.r_id) for r in out.where(F.col("match_prob") >= 0.5).collect()
    }
    tp = len(gold & pred)
    prec = tp / max(len(pred), 1)
    rec = tp / max(len(gold), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.95, (prec, rec, f1)


def test_null_features_scoreable(spark, scored):
    labeled, _ = scored
    model = train_matcher(labeled, ["jacc", "jw", "edit"], "label")
    withnull = spark.createDataFrame(
        [(1, 2, None, None, None)], "l_id int, r_id int, jacc double, jw double, edit double"
    )
    out = score_matches(model, withnull, ["jacc", "jw", "edit"]).collect()
    assert len(out) == 1 and 0.0 <= out[0].match_prob <= 1.0
    assert out[0].jacc is None  # original NULL preserved


def test_scoring_adds_no_joins(scored):
    labeled, out = scored
    # scoring adds projections over the feature plan, never a new join:
    # the scored plan has exactly as many joins as the feature plan it wraps
    feat_joins = labeled._jdf.queryExecution().optimizedPlan().toString().count("Join")
    scored_joins = out._jdf.queryExecution().optimizedPlan().toString().count("Join")
    assert scored_joins == feat_joins
