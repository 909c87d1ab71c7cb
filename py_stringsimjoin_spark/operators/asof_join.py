"""As-of join: attach to each left row the nearest right row at-or-before
(backward) / at-or-after (forward) it on an ordering column, optionally
within per-entity groups and a tolerance — ``pandas.merge_asof`` semantics,
distributed.

Beyond-reference operator (the reference joins on similarity only; key/
output conventions follow its join surface,
/root/reference/py_stringsimjoin/join/jaccard_join_py.py:14-44). Record
linkage over recrawled web data needs it constantly: "score this page
against the SAME url's previous crawl", "attach each purchase to the
user's latest preceding click", "join each measurement to the most recent
calibration". A naive ``JOIN ON r.ts <= l.ts`` explodes quadratically in
each group and Spark has no built-in as-of operator.

Plan (the canonical distributed formulation — one shuffle, no join): tag
and UNION the two inputs, then one window pass per ``by`` group ordered by
``(on, side-tag)`` carries the latest right-row payload forward
(``last(..., ignorenulls=True)`` over unbounded-preceding — backward; the
mirrored ``first`` over unbounded-following — forward). Left rows read the
carried struct; rows farther than ``tolerance`` null it out (merge_asof
semantics: the nearest candidate is the ONLY candidate — tolerance filters
it, it never reaches past it). Right-side ties on the ordering value
resolve to the max-key row WITHOUT a pre-aggregation: the right payload
struct (key leading) is the window's third sort key, so the winning tie
sorts adjacent to the reading side and ``last``/``first`` picks it — the
tie rule costs zero extra plan nodes.

Scale shape (100 TB test): one union + ONE window shuffle partitioned by
``by`` — the entire operator is a single exchange; both sides move once;
no replication, no range probing, no join. Entity-keyed workloads (url, user_id)
give millions of small groups — ideal window parallelism; a skewed hot
entity degrades to single-task sorting of that entity only. WITHOUT ``by``
keys Spark's window moves everything to one partition — fine for dimension
-sized inputs, wrong for a corpus; give the window an entity key or
pre-bucket time into coarse ranges and as-of within them.

``on`` columns are numeric (epoch micros/seconds for timestamps — same
convention as operators/band_join.py; ``F.unix_micros`` is exact where a
double epoch is not). NULL ``on`` or ``by`` values never match (left rows
keep NULL match columns); ``tolerance`` is in the ``on`` column's units.
Output: left key/on/by columns as ``l_<name>`` (by keeps its name), the
matched right key/on as ``r_<name>``, requested ``r_value_attrs`` as
``r_<name>`` — NULL when unmatched. Every op is an exact comparison or
long/double subtraction — bit-identical cross-engine, driver-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def asof_join(
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_on_attr: str,
    r_on_attr: str,
    l_by_attr: str | None = None,
    r_by_attr: str | None = None,
    direction: str = "backward",
    tolerance: float | int | None = None,
    r_value_attrs: list[str] | None = None,
) -> DataFrame:
    """One row per left row: ``(l_<key>, l_<on>, [by], r_<key>, r_<on>,
    r_<value attrs...>)`` — the nearest right row per ``direction``
    (inclusive), NULLs when none qualifies. Ties on the right ``on`` value
    resolve to the largest right key (a total order, stable everywhere)."""
    validate_attr(ltable, l_key_attr, "left")
    validate_attr(rtable, r_key_attr, "right")
    validate_attr(ltable, l_on_attr, "left")
    validate_attr(rtable, r_on_attr, "right")
    if direction not in ("backward", "forward"):
        raise AssertionError(f"unknown direction {direction!r}")
    if tolerance is not None and not (tolerance >= 0):
        raise AssertionError("tolerance must be >= 0")
    if (l_by_attr is None) != (r_by_attr is None):
        raise AssertionError("pass both by attrs or neither")
    if l_by_attr is not None:
        validate_attr(ltable, l_by_attr, "left")
        validate_attr(rtable, r_by_attr, "right")
    vals = list(r_value_attrs or [])
    for a in vals:
        validate_attr(rtable, a, "right")

    by = [F.col(l_by_attr).alias("_by")] if l_by_attr else []
    l = ltable.select(
        *by,
        F.col(l_on_attr).alias("_on"),
        F.struct(
            F.col(l_key_attr).alias("k"), F.col(l_on_attr).alias("o")
        ).alias("_ls"),
    )
    rby = [F.col(r_by_attr).alias("_by")] if r_by_attr else []
    r = rtable.where(F.col(r_on_attr).isNotNull()).select(
        *rby,
        F.col(r_on_attr).alias("_on"),
        F.col(r_key_attr).alias("_rk"),
        *[F.col(a).alias(f"_v_{a}") for a in vals],
    )
    if r_by_attr:
        r = r.where(F.col("_by").isNotNull())
    # right payload struct — key FIRST, so struct order resolves ties on
    # the ordering value to the max-key row
    rs = F.struct(
        F.col("_rk").alias("k"),
        F.col("_on").alias("o"),
        *[F.col(f"_v_{a}").alias(f"v_{a}") for a in vals],
    )
    r = r.select(*(["_by"] if r_by_attr else []), "_on", rs.alias("_rs"))

    byc = ["_by"] if l_by_attr else []
    lu = l.select(
        *byc, "_on", "_ls", F.lit(None).cast(r.schema["_rs"].dataType).alias("_rs"),
        F.lit(1).alias("_tag") if direction == "backward" else F.lit(0).alias("_tag"),
    )
    ru = r.select(
        *byc,
        "_on",
        F.lit(None).cast(lu.schema["_ls"].dataType).alias("_ls"),
        "_rs",
        F.lit(0).alias("_tag") if direction == "backward" else F.lit(1).alias("_tag"),
    )
    u = lu.unionByName(ru)

    # ONE shuffle total: right-side ties on _on are NOT pre-aggregated —
    # the _rs struct rides as the window's third sort key, so among tied
    # right rows the max-key row sorts last (backward, asc → picked by
    # last()) / first (forward, desc → picked by first()). Left rows carry
    # NULL _rs and never share a _tag with right rows, so the extra key
    # cannot reorder across sides.
    rs_order = F.col("_rs").asc() if direction == "backward" else F.col("_rs").desc()
    w = Window.partitionBy(*byc).orderBy(
        F.col("_on").asc(), F.col("_tag").asc(), rs_order
    )
    if direction == "backward":
        carried = F.last("_rs", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        left_tag = 1
    else:
        carried = F.first("_rs", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        left_tag = 0
    # a NULL left `on` never matches (it sorts before every real value, so
    # the forward frame would otherwise see the whole group)
    m = (
        u.withColumn("_m", carried)
        .where(F.col("_tag") == left_tag)
        .withColumn("_m", F.when(F.col("_ls.o").isNotNull(), F.col("_m")))
    )
    if tolerance is not None:
        gap = (
            (F.col("_ls.o") - F.col("_m.o"))
            if direction == "backward"
            else (F.col("_m.o") - F.col("_ls.o"))
        )
        m = m.withColumn(
            "_m",
            F.when(gap <= F.lit(tolerance), F.col("_m")),
        )
    out = m.select(
        F.col("_ls.k").alias(f"l_{l_key_attr}"),
        F.col("_ls.o").alias(f"l_{l_on_attr}"),
        *([F.col("_by").alias(l_by_attr)] if l_by_attr else []),
        F.col("_m.k").alias(f"r_{r_key_attr}"),
        F.col("_m.o").alias(f"r_{r_on_attr}"),
        *[F.col(f"_m.v_{a}").alias(f"r_{a}") for a in vals],
    )
    return out
