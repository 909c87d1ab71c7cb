"""sessionize / session_stats vs a direct per-entity Python scan."""

import random

import pytest

from py_stringsimjoin_spark.operators.sessionize import session_stats, sessionize


def brute(rows, gap):
    by_key = {}
    for i, k, ts in rows:
        if k is None or ts is None:
            continue
        by_key.setdefault(k, []).append((ts, i))
    out = {}
    for k, evs in by_key.items():
        si, prev = -1, None
        for ts, i in sorted(evs):
            if prev is None or ts - prev > gap:
                si += 1
            out[i] = (k, ts, si)
            prev = ts
    return out


def _rows(rng, n=120, keys=6):
    return [
        (i, rng.choice([None] + list(range(keys))), rng.choice([None, rng.randint(0, 500)]))
        for i in range(n)
    ]


def test_vs_brute(spark):
    rng = random.Random(17)
    rows = _rows(rng)
    df = spark.createDataFrame(rows, "eid long, uid long, ts long")
    got = {r.eid: (r.uid, r.ts, r.session_index)
           for r in sessionize(df, "eid", "uid", "ts", 30).collect()}
    assert got == brute(rows, 30)


def test_exact_gap_continues(spark):
    rows = [(1, 1, 0), (2, 1, 10), (3, 1, 21), (4, 1, 31)]
    df = spark.createDataFrame(rows, "eid long, uid long, ts long")
    got = {r.eid: r.session_index
           for r in sessionize(df, "eid", "uid", "ts", 10).collect()}
    # 0→10 = gap exactly: same session; 10→21 = 11 > 10: new session
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}


def test_ts_tie_determinism(spark):
    rows = [(5, 1, 100), (2, 1, 100), (9, 1, 100), (7, 1, 300)]
    df = spark.createDataFrame(rows, "eid long, uid long, ts long")
    got = {r.eid: r.session_index
           for r in sessionize(df, "eid", "uid", "ts", 50).collect()}
    assert got == {5: 0, 2: 0, 9: 0, 7: 1}


def test_session_stats(spark):
    rng = random.Random(29)
    rows = _rows(rng)
    df = spark.createDataFrame(rows, "eid long, uid long, ts long")
    truth = brute(rows, 30)
    sess = {}
    for i, (k, ts, si) in truth.items():
        sess.setdefault((k, si), []).append(ts)
    got = session_stats(df, "eid", "uid", "ts", 30).collect()
    assert len(got) == len(sess)
    for r in got:
        tss = sess[(r.uid, r.session_index)]
        assert (r.session_start, r.session_end, r.n_events, r.duration) == (
            min(tss), max(tss), len(tss), max(tss) - min(tss)
        )


def test_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)], "eid long, uid long, ts long")
    with pytest.raises(AssertionError):
        sessionize(df, "eid", "uid", "ts", 0)
    with pytest.raises(AssertionError):
        sessionize(df, "eid", "uid", "nope", 5)
