"""BPE training vs a pure-python Sennrich-style mirror, the generated
DuckDB oracle SQL, and the apply/train consistency invariant."""

import duckdb
import pandas as pd
import pytest

from py_stringsimjoin_spark.operators.bpe import (
    EOW,
    SEP,
    apply_bpe,
    train_bpe,
    train_bpe_df,
    train_bpe_oracle_sql,
)

DOCS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wider wide wide wider widest"),
    (3, "low new wide"),
    (4, None),
    (5, "   "),
]


def _mirror_train(texts, num_merges, min_pair_count=2):
    from collections import Counter

    vocab = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split():
            if SEP in w:
                continue
            vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        if c < min_pair_count:
            break
        merges.append((a, b, c))
        nv = Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += cnt
        vocab = nv
    return merges, vocab


def test_train_matches_mirror(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = train_bpe(df, "text", num_merges=12, min_pair_count=2)
    exp, _ = _mirror_train([t for _, t in DOCS], 12, 2)
    assert got == exp


def test_train_matches_duckdb_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = train_bpe_df(df, "text", num_merges=8, min_pair_count=1).toPandas()
    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame([d for d in DOCS], columns=["doc_id", "text"])
    )
    sql = train_bpe_oracle_sql("SELECT text FROM docs", "text", 8)
    odf = con.execute(sql).df()
    got = got.sort_values("rank").reset_index(drop=True)
    odf = odf.sort_values("rank").reset_index(drop=True)
    assert got["lhs"].tolist() == odf["lhs"].tolist()
    assert got["rhs"].tolist() == odf["rhs"].tolist()
    assert got["pair_count"].tolist() == odf["pair_count"].tolist()


def test_apply_replays_training_segmentation(spark):
    """For every training word, apply_bpe must reproduce the symbol
    sequence the trainer left in its final vocab."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    merges = train_bpe(df, "text", num_merges=10, min_pair_count=2)
    _, final_vocab = _mirror_train([t for _, t in DOCS], 10, 2)
    seen = {}
    for syms in final_vocab:
        word = "".join(syms).removesuffix(EOW)
        seen[word] = list(syms)
    wdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(seen)], ["doc_id", "text"]
    )
    out = {r["id"]: r["tokens"] for r in apply_bpe(wdf, "doc_id", "text", merges).collect()}
    for i, w in enumerate(seen):
        assert out[i] == seen[w], w


def test_apply_null_and_counts(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    merges = train_bpe(df, "text", num_merges=5)
    out = {r["id"]: (r["tokens"], r["n_tokens"]) for r in
           apply_bpe(df, "doc_id", "text", merges).collect()}
    assert out[4] == (None, 0)
    assert out[5][0] == [] and out[5][1] == 0
    assert out[0][1] == len(out[0][0]) > 0


def test_early_stop_and_validation(spark):
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    # every word is one char + EOW: pairs all have count 1 < min 2
    assert train_bpe(df, "text", num_merges=5, min_pair_count=2) == []
    with pytest.raises(AssertionError):
        train_bpe(df, "text", num_merges=0)
