"""bm25_topk / build_bm25_postings vs an independent pure-Python BM25.

The Python oracle below is written straight from the Robertson–Zaragoza
formula (Lucene non-negative idf), sharing no code with the operator, so
score agreement is a real cross-check. Scores compare at 1e-12 (the
operator's fast path sums in shuffle order); the exact_order path is
asserted bit-equal to the sorted-fold reference.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark import WhitespaceTokenizer
from py_stringsimjoin_spark.operators.bm25 import bm25_topk, build_bm25_postings


def _py_bm25(
    q_rows, x_rows, k1=1.2, b=0.75, stop=(), value_order_fold=False, rational=False
):
    docs = {}
    for xid, t in x_rows:
        if t is None:
            continue
        toks = t.split()
        if toks:
            docs[xid] = toks
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    df = {}
    for toks in docs.values():
        for term in set(toks) - set(stop):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for qid, qt in q_rows:
        if qt is None:
            continue
        qterms = [t for t in dict.fromkeys(qt.split()) if t not in stop]
        for xid, toks in docs.items():
            cs = []
            for term in sorted(qterms):
                tf = sum(1 for w in toks if w == term)
                if tf == 0 or term not in df:
                    continue
                odds = (n - df[term] + 0.5) / (df[term] + 0.5)
                idf = odds if rational else math.log(1.0 + odds)
                cs.append(
                    idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
                )
            if cs:
                # value_order_fold mirrors the operator's exact_order path:
                # contributions sorted ascending, sequential left fold
                s = 0.0
                for c in sorted(cs) if value_order_fold else cs:
                    s += c
                scores[(qid, xid)] = s
    return scores


def _rows(rng, n=30):
    vocab = [f"w{i}" for i in range(60)] + ["the"] * 5  # a hot stopword
    return [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def data():
    rng = random.Random(11)
    x_rows = _rows(rng)
    q_rows = [(100 + j, " ".join(x_rows[j * 3][1].split()[:5])) for j in range(4)]
    q_rows.append((200, None))
    q_rows.append((201, "zz-nomatch"))
    return q_rows, x_rows


def _run(spark, data, k, **kw):
    q_rows, x_rows = data
    qdf = spark.createDataFrame(q_rows, ["qid", "txt"])
    xdf = spark.createDataFrame(x_rows + [(999, None)], ["xid", "txt"])
    out = bm25_topk(qdf, xdf, "qid", "txt", "xid", "txt", k, **kw).collect()
    return {(r.q_id, r.x_id): (r.score, r.rank) for r in out}


def test_topk_vs_python(spark, data):
    truth = _py_bm25(*data)
    got = _run(spark, data, k=5)
    for qid in {q for q, _ in truth}:
        want = sorted(
            ((s, x) for (q, x), s in truth.items() if q == qid),
            key=lambda p: (-p[0], p[1]),
        )[:5]
        mine = sorted(
            ((x, s, r) for (q, x), (s, r) in got.items() if q == qid),
            key=lambda p: p[2],
        )
        assert [x for x, _, _ in mine] == [x for _, x in want]
        for (x, s, r), (ws, wx) in zip(mine, want):
            assert s == pytest.approx(ws, abs=1e-12)
    # rank is 1-based consecutive
    for qid in {q for q, _ in got}:
        ranks = sorted(r for (q, _), (_, r) in got.items() if q == qid)
        assert ranks == list(range(1, len(ranks) + 1))
    # null / no-match queries emit nothing
    assert not any(q in (200, 201) for q, _ in got)


def test_exact_order_bit_equal(spark, data):
    q_rows, x_rows = data
    truth = _py_bm25(q_rows, x_rows, value_order_fold=True, rational=True)
    got = _run(spark, data, k=5, exact_order=True, idf_kind="rational")
    for (qid, xid), (s, _) in got.items():
        assert s == truth[(qid, xid)]  # bit-exact: sorted-fold both sides
    # the lucene-idf path agrees to 1e-12 (Java Math.log vs libm: 1 ulp)
    lt = _py_bm25(q_rows, x_rows)
    for (qid, xid), (s, _) in _run(spark, data, k=5, exact_order=True).items():
        assert s == pytest.approx(lt[(qid, xid)], abs=1e-12)


def test_stop_terms_and_prebuilt_postings(spark, data):
    q_rows, x_rows = data
    truth = _py_bm25(q_rows, x_rows, stop=("the",))
    qdf = spark.createDataFrame(q_rows, ["qid", "txt"])
    xdf = spark.createDataFrame(x_rows, ["xid", "txt"])
    idx = build_bm25_postings(xdf, "xid", "txt", stop_terms=["the"])
    out = bm25_topk(
        qdf, xdf, "qid", "txt", "xid", "txt", 3, stop_terms=["the"], postings=idx
    ).collect()
    for r in out:
        assert r.score == pytest.approx(truth[(r.q_id, r.x_id)], abs=1e-12)
    # postings shape: (x_id, _term, _tf, _dl); stopword absent
    post, dfreq, stats = idx
    assert "the" not in {r._term for r in dfreq.collect()}
    st = stats.collect()[0]
    assert st._n_docs == len(x_rows)


def test_validation(spark, data):
    q_rows, x_rows = data
    qdf = spark.createDataFrame(q_rows, ["qid", "txt"])
    xdf = spark.createDataFrame(x_rows, ["xid", "txt"])
    with pytest.raises(AssertionError):
        bm25_topk(qdf, xdf, "qid", "txt", "xid", "txt", 0)
    with pytest.raises(AssertionError):
        bm25_topk(qdf, xdf, "qid", "txt", "xid", "txt", 3, b=1.5)
    with pytest.raises(AssertionError):
        bm25_topk(qdf, xdf, "qid", "nope", "xid", "txt", 3)
    with pytest.raises(AssertionError):
        bm25_topk(qdf, xdf, "qid", "txt", "xid", "txt", 3, idf_kind="bm25L")
