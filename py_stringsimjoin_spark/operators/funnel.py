"""Funnel analysis — ordered event-sequence completion per entity.

The classic product/behavior query over an event stream: how far does
each user get through the ordered step sequence s₁ → s₂ → … → s_k, with
an optional completion window? Semantics are the standard "first touch"
funnel (the common analytics-engine default): anchor at the user's FIRST
s₁ event, then greedily take the earliest s_i event STRICTLY after the
matched s_{i−1} (same-timestamp events cannot satisfy two consecutive
steps), constrained — when ``within_us`` is set — to
``ts ≤ t₁ + within_us``. Greedy-from-first-touch is deterministic and
one-pass; it can miss completions a later anchor would catch (the known
trade-off of every first-touch funnel — documented, not hidden).
Complements ``sessionize`` / ``asof_join`` / windowed match metrics in
the events family; beyond-reference (SURVEY.md §2.5).

Scale shape (100 TB test): ONE shuffle keyed on the entity (the
sessionize shape): per-user events collect into a sorted array and a
single JVM ``aggregate`` fold walks it with an O(1) accumulator
(step, t₁, t_prev) — no window function, no per-step join cascade, no
Python. Per-user event counts bound the array (the same bound
sessionization already assumes); k is a literal. The SQL oracle replays
the identical semantics as k chained min() CTE stages — integer
microsecond arithmetic only, hash-exact.

Determinism: events fold in (ts, event-id-free) ascending-ts order; ties
at the same ts cannot change any matched t_i because each stage takes the
MINIMUM qualifying ts and the strict ``>`` guard is evaluated against
t_{i−1} values, not array positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def funnel(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_us: int | None = None,
) -> DataFrame:
    """(entity, steps_completed, completed, t_first_us, t_complete_us) —
    one row per entity appearing in ``events``. ``ts_col`` must be a
    timestamp (folded to exact epoch microseconds) or an integral type
    (used as-is)."""
    validate_attr(events, entity_col, "events")
    validate_attr(events, ts_col, "events")
    validate_attr(events, type_col, "events")
    steps = list(steps)
    if not steps:
        raise AssertionError("steps must be non-empty")
    if within_us is not None and within_us <= 0:
        raise AssertionError("within_us must be positive")
    k = len(steps)
    ts_type = dict(events.dtypes)[ts_col]
    ts = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        if "timestamp" in ts_type
        else F.col(ts_col).cast("long")
    )
    ev = events.select(
        F.col(entity_col).alias("entity"),
        ts.alias("_ts"),
        F.col(type_col).alias("_ty"),
    ).where(F.col("_ts").isNotNull() & F.col("_ty").isNotNull())
    per = ev.groupBy("entity").agg(
        F.array_sort(F.collect_list(F.struct("_ts", "_ty"))).alias("_evs")
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("step"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("tprev"),
    )

    def fold(acc, e):
        want = F.element_at(step_arr, acc["step"] + 1)
        in_window = (
            F.lit(True)
            if within_us is None
            else (acc["step"] == 0) | (e["_ts"] <= acc["t1"] + F.lit(int(within_us)))
        )
        advance = (
            (acc["step"] < k)
            & (e["_ty"] == want)
            & ((acc["step"] == 0) | (e["_ts"] > acc["tprev"]))
            & in_window
        )
        return F.when(
            advance,
            F.struct(
                (acc["step"] + 1).alias("step"),
                F.coalesce(acc["t1"], e["_ts"]).alias("t1"),
                e["_ts"].alias("tprev"),
            ),
        ).otherwise(acc)

    res = per.select(
        "entity", F.aggregate(F.col("_evs"), init, fold).alias("_acc")
    )
    return res.select(
        "entity",
        F.col("_acc.step").cast("long").alias("steps_completed"),
        (F.col("_acc.step") == k).alias("completed"),
        F.col("_acc.t1").alias("t_first_us"),
        F.when(F.col("_acc.step") == k, F.col("_acc.tprev")).alias(
            "t_complete_us"
        ),
    )


def funnel_oracle_sql(
    events_cte: str, steps: list[str], within_us: int | None = None
) -> str:
    """Chained-CTE SQL replay of the identical first-touch semantics over
    a CTE named ``events_cte`` with columns (entity, ts_us, ty)."""
    k = len(steps)
    parts = [
        f"s1 AS (SELECT entity, min(ts_us) AS t1 FROM {events_cte} "
        f"WHERE ty = '{steps[0]}' GROUP BY 1)"
    ]
    for i in range(2, k + 1):
        win = (
            f" AND e.ts_us <= s1.t1 + {int(within_us)}" if within_us else ""
        )
        anchor_join = " JOIN s1 USING (entity)" if (within_us and i > 2) else ""
        parts.append(
            f"""s{i} AS (
  SELECT e.entity, min(e.ts_us) AS t{i}
  FROM {events_cte} e
  JOIN s{i - 1} USING (entity){anchor_join}
  WHERE e.ty = '{steps[i - 1]}' AND e.ts_us > s{i - 1}.t{i - 1}{win}
  GROUP BY 1
)"""
        )
    done = " + ".join(
        f"(CASE WHEN s{i}.t{i} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(1, k + 1)
    )
    joins = "\n".join(
        f"LEFT JOIN s{i} USING (entity)" for i in range(1, k + 1)
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT u.entity,
       ({done})::BIGINT AS steps_completed,
       s{k}.t{k} IS NOT NULL AS completed,
       s1.t1 AS t_first_us,
       s{k}.t{k} AS t_complete_us
FROM (SELECT DISTINCT entity FROM {events_cte}) u
{joins}
"""
    )
