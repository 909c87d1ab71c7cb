"""containment_lsh_search (LSH-Ensemble) vs brute-force containment truth.

Everything is md5-deterministic, so the candidate set — and therefore the
output — is reproducible run to run: the recall assertions below are real
assertions, not flaky probabilistic ones. Precision is exact by
construction (candidates are verified on the true token sets), so output
⊆ truth with bit-equal scores is asserted unconditionally.
"""

import random

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark import ShingleTokenizer, WhitespaceTokenizer
from py_stringsimjoin_spark.operators.containment_lsh import (
    containment_index_rows,
    containment_lsh_search,
    probe_bands_col,
    size_class_col,
)


def _truth(q_rows, x_rows, tok, t):
    out = {}
    for qid, qt in q_rows:
        qs = set(tok.tokenize(qt))
        if not qs:
            continue
        for xid, xt in x_rows:
            xs = set(tok.tokenize(xt))
            c = len(qs & xs) / len(qs)
            if c >= t:
                out[(qid, xid)] = c
    return out


def _corpus(rng, n=40):
    vocab = [f"tok{i}" for i in range(400)]
    rows = []
    for i in range(n):
        # size spread over several geometric classes: 4 .. ~256 tokens
        sz = rng.choice([4, 9, 17, 33, 70, 150, 250])
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(sz))))
    return rows


def test_search_vs_truth(spark):
    rng = random.Random(3)
    x_rows = _corpus(rng)
    tok = WhitespaceTokenizer(return_set=True)
    # queries: token subsets of known pages (true containment 1.0) plus noise
    q_rows = []
    for qid, src in [(100, 0), (101, 3), (102, 6)]:
        words = x_rows[src][1].split()
        q_rows.append((qid, " ".join(words[: max(3, len(words) // 3)])))
    q_rows.append((103, "zzz yyy xxx www"))  # matches nothing
    qdf = spark.createDataFrame(q_rows, ["qid", "txt"])
    xdf = spark.createDataFrame(x_rows, ["xid", "txt"])

    out = containment_lsh_search(
        qdf, xdf, "qid", "txt", "xid", "txt", 0.8,
        tokenizer=tok, num_perm=128, p_recall=0.98,
    )
    got = {(r["q_id"], r["x_id"]): r["containment"] for r in out.collect()}
    truth = _truth(q_rows, x_rows, tok, 0.8)

    # precision is exact: every emitted pair is a true pair, score bit-equal
    for k, v in got.items():
        assert k in truth and v == pytest.approx(truth[k], abs=1e-12)
    # the planted subset queries MUST be found (containment 1.0 pairs have
    # j* >= t/(1+ratio-t) and the deterministic hashes catch them here)
    for qid, src in [(100, 0), (101, 3), (102, 6)]:
        assert (qid, src) in got and got[(qid, src)] == pytest.approx(1.0)
    assert not any(q == 103 for q, _ in got)
    # deterministic recall on this fixture
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))


def test_prebuilt_index_reuse(spark):
    rng = random.Random(9)
    x_rows = _corpus(rng, n=25)
    # plant a small doc whose tokens the query draws from (id 2)
    x_rows[2] = (2, "alpha beta gamma delta epsilon zeta eta theta")
    tok = WhitespaceTokenizer(return_set=True)
    q_rows = [(0, " ".join(x_rows[2][1].split()[:6]))]
    qdf = spark.createDataFrame(q_rows, ["qid", "txt"])
    xdf = spark.createDataFrame(x_rows, ["xid", "txt"])
    idx = containment_index_rows(
        xdf, "xid", "txt", tok, num_perm=64, rows_per_band=1
    ).cache()
    a = containment_lsh_search(
        qdf, xdf, "qid", "txt", "xid", "txt", 0.9, tokenizer=tok,
        num_perm=64, rows_per_band=1, index_rows=idx,
    )
    b = containment_lsh_search(
        qdf, xdf, "qid", "txt", "xid", "txt", 0.9, tokenizer=tok,
        num_perm=64,
    )
    ra = {(r["q_id"], r["x_id"]): r["containment"] for r in a.collect()}
    rb = {(r["q_id"], r["x_id"]): r["containment"] for r in b.collect()}
    assert ra == rb and (0, 2) in ra
    idx.unpersist()


def test_snippet_in_page_shingles(spark):
    """The motivating web case: a quoted snippet found inside a much larger
    page via 3-shingle containment — the size-ratio regime where symmetric
    jaccard LSH structurally fails (j ≈ |Q|/|X| ≪ any usable threshold)."""
    snippet = " ".join(f"w{i}" for i in range(12))
    page = (
        " ".join(f"pre{i}" for i in range(80))
        + " " + snippet + " "
        + " ".join(f"post{i}" for i in range(120))
    )
    other = " ".join(f"z{i}" for i in range(150))
    qdf = spark.createDataFrame([(1, snippet)], ["qid", "txt"])
    xdf = spark.createDataFrame([(10, page), (11, other)], ["xid", "txt"])
    out = containment_lsh_search(
        qdf, xdf, "qid", "txt", "xid", "txt", 0.9,
        tokenizer=ShingleTokenizer(n=3), num_perm=128, p_recall=0.98,
    )
    got = {(r["q_id"], r["x_id"]): r["containment"] for r in out.collect()}
    assert got == {(1, 10): pytest.approx(1.0)}


def test_size_class_and_probe_cols(spark):
    """Class boundaries are exact at powers of base; b' grows with the
    class upper bound (smaller j* needs more bands) and is clamped."""
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (7,), (8,), (256,)], ["n"]
    )
    got = [
        r["c"]
        for r in df.select(size_class_col(F.col("n"), 2.0).alias("c"))
        .orderBy("n")
        .collect()
    ]
    assert got == [0, 1, 1, 2, 2, 3, 8]
    probes = spark.range(1).select(
        *[
            probe_bands_col(
                F.lit(20), F.lit(float(u)), 0.8, 2, 32, 0.95
            ).alias(f"b{u}")
            for u in (31, 127, 1023)
        ]
    ).first()
    assert probes["b31"] <= probes["b127"] <= probes["b1023"] <= 32
    assert probes["b31"] >= 1


def test_class_prune_blocks_small_corpus_docs(spark):
    """A class whose upper bound is below ⌈t·q⌉ is never probed: a 30-token
    query at t=0.9 needs |X| ≥ 27, so 4-token docs can never match."""
    q = " ".join(f"q{i}" for i in range(30))
    qdf = spark.createDataFrame([(1, q)], ["qid", "txt"])
    xdf = spark.createDataFrame(
        [(5, "q0 q1 q2 q3")], ["xid", "txt"]
    )
    out = containment_lsh_search(
        qdf, xdf, "qid", "txt", "xid", "txt", 0.9,
        tokenizer=WhitespaceTokenizer(return_set=True), num_perm=32,
    )
    assert out.count() == 0
