"""chunk_documents vs a direct Python windowing mirror."""

import random

import pytest

from py_stringsimjoin_spark.operators.chunking import chunk_documents


def brute(rows, chunk, overlap, drop_tail):
    step = chunk - overlap
    out = {}
    for i, t in rows:
        if t is None:
            continue
        toks = t.split()
        n = len(toks)
        starts = [s for s in range(0, n, step)]
        if drop_tail:
            starts = [
                s for s in starts if not (s > 0 and s - step + chunk >= n)
            ]
        for ci, s in enumerate(starts):
            w = toks[s : s + chunk]
            out[(i, ci)] = (" ".join(w), len(w))
    return out


@pytest.mark.parametrize("chunk,overlap", [(10, 0), (10, 3), (7, 6), (1, 0)])
@pytest.mark.parametrize("drop_tail", [True, False])
def test_vs_brute(spark, chunk, overlap, drop_tail):
    rng = random.Random(chunk * 100 + overlap)
    rows = [
        (i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(rng.randint(0, 35)))
         or None)
        for i in range(30)
    ]
    rows += [(100, None), (101, "   "), (102, "a  b\t c\nd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_index): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(
            df, "doc_id", "text", chunk, overlap, drop_contained_tail=drop_tail
        ).collect()
    }
    assert got == brute(rows, chunk, overlap, drop_tail)


def test_coverage_and_overlap(spark):
    # every token position is covered; consecutive chunks share `overlap`
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", 16, 4).collect(),
        key=lambda r: r.chunk_index,
    )
    seen = []
    for a, b in zip(rows, rows[1:]):
        at, bt = a.chunk_text.split(), b.chunk_text.split()
        assert at[-4:] == bt[:4]
        seen.extend(at)
    seen.extend(rows[-1].chunk_text.split())
    assert set(seen) == {f"t{i}" for i in range(100)}


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(AssertionError):
        chunk_documents(df, "doc_id", "text", 0)
    with pytest.raises(AssertionError):
        chunk_documents(df, "doc_id", "text", 5, 5)
    with pytest.raises(AssertionError):
        chunk_documents(df, "doc_id", "nope", 5)
