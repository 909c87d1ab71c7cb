"""Corpus-hygiene operators (operators/textclean.py): hand-computed cases,
brute-force mirrors on randomized corpora, and null/blank edge cases.

The reference has no corpus-cleaning surface; these are beyond-reference
pipeline components, so parity is against an independent in-test Python
implementation (plus the driver's DuckDB oracles for the two queries).
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from py_stringsimjoin_spark.operators.textclean import (
    dedup_lines,
    dedup_spans,
    repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b c\na b a b c\nx y z\n\nx y z"),
        (2, "hello world"),
        (3, ""),
        (4, None),
        (5, "p q r s t u v w"),
        (6, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_repetition_stats_hand_computed(docs):
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(docs, ngram_n=2).collect()
    }
    d1 = out[1]
    # non-blank lines: [ababc, ababc, xyz, xyz] -> 4 total, 2 distinct
    assert d1["n_lines"] == 4 and d1["dup_line_frac"] == 0.5
    assert d1["dup_line_char_frac"] == 0.5  # 28 chars total, 14 distinct
    # 16 words -> 15 bigrams, 8 distinct, mode "a b" x4
    assert d1["n_ngrams"] == 15
    assert d1["dup_ngram_frac"] == pytest.approx(round(7 / 15, 6))
    assert d1["top_ngram_frac"] == pytest.approx(round(4 / 15, 6))
    assert out[2]["top_ngram_frac"] == 1.0 and out[2]["dup_line_frac"] == 0.0
    # empty / whitespace-only text: zero counts, zero fracs
    for i in (3, 6):
        assert out[i]["n_lines"] == 0 and out[i]["top_ngram_frac"] == 0.0
    # NULL text: all stats NULL
    assert all(v is None for k, v in out[4].items() if k != "doc_id")


def test_dedup_lines_keep_first(docs):
    out = {r["doc_id"]: r.asDict() for r in dedup_lines(docs).collect()}
    # duplicate lines removed corpus-wide, first occurrence and blank kept
    assert out[1]["clean_text"] == "a b a b c\nx y z\n"
    assert out[1]["n_segments"] == 4 and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "hello world" and out[2]["n_removed"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_segments"] == 0
    assert out[4]["clean_text"] is None
    assert out[6]["clean_text"] == "   "  # blank-only line survives


def test_dedup_lines_cross_doc_and_unique(spark):
    rows = [(1, "keep me\nshared line"), (2, "shared line\nother")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    first = {r["doc_id"]: r["clean_text"] for r in dedup_lines(df).collect()}
    assert first == {1: "keep me\nshared line", 2: "other"}
    uniq = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_lines(df, keep="unique").collect()
    }
    assert uniq == {1: "keep me", 2: "other"}


def _brute_spans(rows, span, keep):
    segs = []  # (doc, pos, seg)
    for doc, text in rows:
        if text is None:
            continue
        ws = text.split()
        for pos, i in enumerate(range(0, len(ws), span)):
            segs.append((doc, pos, " ".join(ws[i : i + span])))
    cnt = Counter(s for _, _, s in segs)
    first = {}
    for doc, pos, s in sorted(segs):
        first.setdefault(s, (doc, pos))
    out = {}
    for doc, text in rows:
        if text is None:
            out[doc] = (None, 0, 0)
            continue
        mine = [(p, s) for d, p, s in segs if d == doc]
        kept = [
            s
            for p, s in mine
            if cnt[s] == 1 or (keep == "first" and first[s] == (doc, p))
        ]
        out[doc] = (" ".join(kept), len(mine), len(mine) - len(kept))
    return out


@pytest.mark.parametrize("keep", ["first", "unique"])
def test_dedup_spans_brute_force(spark, keep):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    shared = " ".join(rng.choice(vocab) for _ in range(6))
    rows = []
    for doc in range(30):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        text = " ".join(words)
        if rng.random() < 0.5:
            text = (text + " " + shared).strip()
        rows.append((doc, text if text else ""))
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_removed"])
        for r in dedup_spans(df, span_words=3, keep=keep).collect()
    }
    want = _brute_spans(rows, 3, keep)
    assert got == want


def test_dedup_spans_self_repetition_collapses(spark):
    # a doc made of one span repeated collapses to a single copy
    df = spark.createDataFrame(
        [(1, "spam ham eggs spam ham eggs spam ham eggs")],
        "doc_id int, text string",
    )
    (r,) = dedup_spans(df, span_words=3, keep="first").collect()
    assert r["clean_text"] == "spam ham eggs"
    assert (r["n_segments"], r["n_removed"]) == (3, 2)


def test_dedup_spans_trailing_partial_span(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "d e")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup_spans(df, span_words=3, keep="first").collect()
    }
    # doc 1's trailing short span "d e" == doc 2's only span; (1,1) < (2,0)
    assert out[1]["clean_text"] == "a b c d e" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 1


def test_gopher_quality_filter_rules(spark):
    from py_stringsimjoin_spark.operators.textclean import gopher_quality_filter

    rows = [
        (1, "one two three four five six seven eight"),        # passes
        (2, "tiny"),                                           # too_few_words
        (3, " ".join(f"w{i}" for i in range(30))),             # too_many_words
        (4, "a b c d e f"),                                    # mean_word_len_low
        (5, "elephantine wordiness extravaganza bonanza"),     # mean_word_len_high
        (6, "dup line\ndup line\ndup line\nxx yy zz"),         # dup_line_frac
        (9, "dup line\ndup line\nx\ny\nz\nq\nr"),              # dup_line_char_frac
        (7, "ha ha ha ha ha ha"),                              # top/dup ngram
        (8, None),                                             # null_text
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_filter(
            df,
            min_words=4,
            max_words=20,
            min_mean_word_len=1.5,
            max_mean_word_len=8.0,
            max_dup_line_frac=0.25,
            max_dup_ngram_frac=0.5,
            max_top_ngram_frac=0.6,
        ).collect()
    }
    assert out[1]["keep"] and out[1]["reason"] is None
    assert out[2]["reason"] == "too_few_words"
    assert out[3]["reason"] == "too_many_words"
    assert out[4]["reason"] == "mean_word_len_low"
    assert out[4]["mean_word_len"] == 1.0
    assert out[5]["reason"] == "mean_word_len_high"
    # doc 6: 4 lines / 2 distinct -> dup_line_frac 0.5 > 0.25
    assert out[6]["reason"] == "dup_line_frac"
    # doc 9: dup_line_frac 1/7 passes but 8/21 of chars sit in dup lines
    assert out[9]["reason"] == "dup_line_char_frac"
    # "ha ha..." : 5 bigrams all identical -> dup 0.8 > 0.5 fires before top
    assert out[7]["reason"] == "dup_ngram_frac"
    assert out[8]["reason"] == "null_text" and out[8]["n_words"] is None
    assert all((r["reason"] is None) == r["keep"] for r in out.values())


class TestBoilerplateLines:
    def _run(self, spark, rows, min_pages=2):
        from py_stringsimjoin_spark.operators.textclean import (
            remove_boilerplate_lines,
        )

        df = spark.createDataFrame(rows, "doc_id int, source string, text string")
        out = remove_boilerplate_lines(
            df, "doc_id", "text", "source", min_pages=min_pages
        )
        return {r.doc_id: r for r in out.collect()}

    def test_site_footer_stripped_unique_survives(self, spark):
        rows = [
            (1, "s1", "real content one\nfooter line"),
            (2, "s1", "different words here\nfooter line"),
            (3, "s1", "third page body\nfooter line\nref code 3"),
            # same footer text on ANOTHER site with only one page: kept
            (4, "s2", "other site page\nfooter line"),
        ]
        got = self._run(spark, rows, min_pages=2)
        assert got[1].clean_text == "real content one"
        assert got[2].clean_text == "different words here"
        assert got[3].clean_text == "third page body\nref code 3"
        assert got[3].n_removed == 1 and got[3].n_lines == 3
        assert got[4].clean_text == rows[3][2]  # s2 untouched
        assert got[4].n_removed == 0

    def test_all_occurrences_removed_not_first_kept(self, spark):
        rows = [
            (1, "s", "keep\nnav"),
            (2, "s", "nav\nkeep two"),
        ]
        got = self._run(spark, rows, min_pages=2)
        # 'nav' removed from BOTH pages (no canonical first occurrence)
        assert got[1].clean_text == "keep"
        assert got[2].clean_text == "keep two"

    def test_within_page_repeats_count_once(self, spark):
        # the same line twice on ONE page is one distinct page — below the
        # 2-page bar, so it stays
        rows = [(1, "s", "dup\nbody\ndup"), (2, "s", "other")]
        got = self._run(spark, rows, min_pages=2)
        assert got[1].clean_text == "dup\nbody\ndup"
        assert got[1].n_removed == 0

    def test_blank_null_and_null_group(self, spark):
        rows = [
            (1, "s", "a\n\nfooter"),
            (2, "s", "b\n\nfooter"),
            (3, "s", None),
            (4, None, "footer\nfooter"),
        ]
        got = self._run(spark, rows, min_pages=2)
        # blank line is structural — survives; footer goes
        assert got[1].clean_text == "a\n"
        assert got[2].clean_text == "b\n"
        assert got[3].clean_text is None and got[3].n_lines == 0
        # NULL group never matches a boilerplate set
        assert got[4].clean_text == "footer\nfooter"

    def test_plan_python_free(self, spark):
        from py_stringsimjoin_spark.operators.textclean import (
            remove_boilerplate_lines,
        )

        df = spark.createDataFrame(
            [(1, "s", "a\nb")], "doc_id int, source string, text string"
        )
        out = remove_boilerplate_lines(df, "doc_id", "text", "source")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
