"""funnel vs a direct python mirror + the DuckDB chained-CTE oracle."""

import duckdb
import pandas as pd
import pytest

from py_stringsimjoin_spark.operators.funnel import funnel, funnel_oracle_sql

# (entity, ts_us, type)
EV = [
    (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),       # completes
    (2, 10, "view"), (2, 15, "purchase"), (2, 40, "click"),       # v->c, no p after c
    (3, 10, "click"), (3, 20, "view"), (3, 30, "click"), (3, 35, "purchase"),
    (4, 10, "view"),                                              # stalls at 1
    (5, 10, "error"),                                             # 0 steps
    (6, 10, "view"), (6, 10, "click"),   # same-ts: click can't follow view
    (7, 10, "view"), (7, 500, "click"), (7, 600, "purchase"),     # window test
]
STEPS = ["view", "click", "purchase"]


def _mirror(ev, steps, within=None):
    from collections import defaultdict

    by = defaultdict(list)
    for e, t, ty in ev:
        by[e].append((t, ty))
    out = {}
    for e, rows in by.items():
        rows.sort()
        step, t1, tprev = 0, None, None
        for t, ty in rows:
            if step < len(steps) and ty == steps[step] and (
                step == 0 or t > tprev
            ) and (within is None or step == 0 or t <= t1 + within):
                step += 1
                if t1 is None:
                    t1 = t
                tprev = t
        out[e] = (
            step,
            step == len(steps),
            t1,
            tprev if step == len(steps) else None,
        )
    return out


@pytest.mark.parametrize("within", [None, 100])
def test_matches_mirror_and_oracle(spark, within):
    df = spark.createDataFrame(EV, ["user_id", "ts_us", "event_type"])
    got = {
        r["entity"]: (
            r["steps_completed"],
            r["completed"],
            r["t_first_us"],
            r["t_complete_us"],
        )
        for r in funnel(
            df, "user_id", "ts_us", "event_type", STEPS, within_us=within
        ).collect()
    }
    assert got == _mirror(EV, STEPS, within)
    con = duckdb.connect()
    con.register("raw", pd.DataFrame(EV, columns=["entity", "ts_us", "ty"]))
    sql = "WITH ev AS (SELECT * FROM raw),\n" + funnel_oracle_sql(
        "ev", STEPS, within
    )
    odf = con.execute(sql).df()
    oracle = {
        int(r.entity): (
            int(r.steps_completed),
            bool(r.completed),
            None if pd.isna(r.t_first_us) else int(r.t_first_us),
            None if pd.isna(r.t_complete_us) else int(r.t_complete_us),
        )
        for r in odf.itertuples()
    }
    assert got == oracle


def test_window_cuts_completion(spark):
    df = spark.createDataFrame(EV, ["user_id", "ts_us", "event_type"])
    loose = {r["entity"]: r["completed"] for r in funnel(
        df, "user_id", "ts_us", "event_type", STEPS).collect()}
    tight = {r["entity"]: r["completed"] for r in funnel(
        df, "user_id", "ts_us", "event_type", STEPS, within_us=100).collect()}
    assert loose[7] is True and tight[7] is False
    assert tight[1] is True


def test_validation(spark):
    df = spark.createDataFrame(EV, ["user_id", "ts_us", "event_type"])
    with pytest.raises(AssertionError):
        funnel(df, "user_id", "ts_us", "event_type", [])
    with pytest.raises(AssertionError):
        funnel(df, "user_id", "ts_us", "event_type", STEPS, within_us=0)
