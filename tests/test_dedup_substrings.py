"""dedup_substrings vs an independent brute-force Python mirror.

The mirror implements the spec directly (sliding windows over a dict of
word lists, set arithmetic for the cover) with none of the operator's
DataFrame machinery, so agreement is evidence of the semantics, not of the
implementation agreeing with itself.
"""

import pytest

from py_stringsimjoin_spark.operators.textclean import dedup_substrings


def brute(rows, min_words, keep):
    """rows: list of (doc_id, text). Returns {doc_id: (clean, n, removed)}."""
    words = {
        i: ([w for w in t.strip().split() if w.strip()] if t is not None else None)
        for i, t in rows
    }
    occ = []  # (gram_text, doc_id, start) — start 1-based
    for i in sorted(words):
        ws = words[i]
        if ws is None:
            continue
        for s in range(1, len(ws) - min_words + 2):
            occ.append((" ".join(ws[s - 1 : s - 1 + min_words]), i, s))
    from collections import defaultdict

    by_gram = defaultdict(list)
    for g, i, s in occ:
        by_gram[g].append((i, s))
    covered = defaultdict(set)
    for g, sites in by_gram.items():
        if len(sites) < 2:
            continue
        sites = sorted(sites)
        dups = sites[1:] if keep == "first" else sites
        for i, s in dups:
            covered[i].update(range(s, s + min_words))
    out = {}
    for i, t in rows:
        ws = words[i]
        if ws is None:
            out[i] = (None, 0, 0)
            continue
        cov = covered.get(i, set())
        kept = [w for p, w in enumerate(ws, start=1) if p not in cov]
        out[i] = (" ".join(kept), len(ws), len(cov & set(range(1, len(ws) + 1))))
    return out


def check(spark, rows, min_words=3, keep="first"):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
        for r in dedup_substrings(df, "doc_id", "text", min_words, keep).collect()
    }
    assert got == brute(rows, min_words, keep)


def test_cross_doc_duplicate_run_removed_any_alignment(spark):
    # the 5-word duplicated run sits at offset 2 in doc 1 and offset 4 in
    # doc 2 — the non-overlapping-grid dedup_spans would miss this
    rows = [
        (1, "a1 a2 DUP1 DUP2 DUP3 DUP4 DUP5 z1"),
        (2, "b1 b2 b3 b4 DUP1 DUP2 DUP3 DUP4 DUP5 z2 z3"),
    ]
    check(spark, rows, min_words=3)
    # keep="first": doc 1 (first occurrence) keeps the run, doc 2 loses it
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["clean_text"]
           for r in dedup_substrings(df, min_words=3).collect()}
    assert got[1] == "a1 a2 DUP1 DUP2 DUP3 DUP4 DUP5 z1"
    assert got[2] == "b1 b2 b3 b4 z2 z3"


def test_keep_unique_drops_all_copies(spark):
    rows = [
        (1, "x y c1 c2 c3 t1"),
        (2, "c1 c2 c3 t2 t3 t4"),
    ]
    check(spark, rows, min_words=3, keep="unique")


def test_within_doc_repeat_and_overlaps(spark):
    rows = [
        (1, "r r r r r r r r"),  # every window duplicates every other
        (2, "p q r r r s"),
        (3, None),
        (4, ""),
        (5, "too short"),
    ]
    check(spark, rows, min_words=3, keep="first")
    check(spark, rows, min_words=3, keep="unique")


def test_randomized_vs_brute(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(12)]
    shared = " ".join(rng.choice(vocab) for _ in range(6))
    rows = []
    for i in range(20):
        n = rng.randrange(0, 15)
        t = " ".join(rng.choice(vocab) for _ in range(n))
        if rng.random() < 0.5:
            cut = rng.randrange(0, len(t.split()) + 1)
            ws = t.split()
            t = " ".join(ws[:cut] + shared.split() + ws[cut:])
        rows.append((i, t))
    check(spark, rows, min_words=4, keep="first")
    check(spark, rows, min_words=4, keep="unique")


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        dedup_substrings(df, min_words=0)
    with pytest.raises(ValueError):
        dedup_substrings(df, keep="last")
