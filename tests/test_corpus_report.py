"""corpus_report vs a direct python mirror."""

import pytest

from py_stringsimjoin_spark.operators.corpus_report import corpus_report

DOCS = [
    (0, "alpha beta gamma", "en"),
    (1, "alpha beta gamma", "en"),   # exact dup of 0
    (2, "alpha beta gamma", "fr"),   # exact dup again (group differs)
    (3, "x", "fr"),
    (4, "", "de"),
    (5, None, None),
    (6, "  spaced   out  ", "de"),
]


def test_scalars(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    scalars, breakdown = corpus_report(
        df, "doc_id", "text", group_attr="lang", len_buckets=(1, 16)
    )
    s = scalars.first().asDict()
    texts = [t for _, t, _ in DOCS if t is not None]
    toks = [len(t.split()) for t in texts]
    assert s["n_docs"] == 7
    assert s["n_null_text"] == 1
    # "" -> 0 tokens is empty; "  spaced   out  " -> 2 tokens is not
    assert s["n_empty_text"] == sum(1 for t in toks if t == 0)
    assert s["n_tokens"] == sum(toks)
    assert s["n_chars"] == sum(len(t) for t in texts)
    assert s["mean_tokens"] == sum(toks) / 6.0
    assert s["n_distinct_texts"] == len(set(texts))
    assert s["exact_dup_docs"] == len(texts) - len(set(texts))
    assert s["exact_dup_rate"] == (len(texts) - len(set(texts))) / 6.0
    assert s["n_len_le_1"] == sum(1 for t in texts if len(t) <= 1)
    assert s["n_len_le_16"] == sum(1 for t in texts if len(t) <= 16)

    b = {r["group"]: r.asDict() for r in breakdown.collect()}
    assert set(b) == {"en", "fr", "de", None}
    assert b["en"]["n_docs"] == 2 and b["en"]["n_tokens"] == 6
    assert b["fr"]["n_docs"] == 2 and b["fr"]["n_tokens"] == 4
    assert b[None]["n_docs"] == 1 and b[None]["n_tokens"] == 0
    assert b["de"]["doc_share"] == 2 / 7.0


def test_no_group(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    scalars, breakdown = corpus_report(df, "doc_id", "text")
    assert breakdown is None
    assert scalars.first()["n_docs"] == 7


def test_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    with pytest.raises(AssertionError):
        corpus_report(df, "doc_id", "text", len_buckets=(0,))
