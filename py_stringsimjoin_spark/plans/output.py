"""Output-table assembly shared by all joins/filters/matcher.

Reference layout (/root/reference/py_stringsimjoin/utils/generic_helper.py:43-60):
``[_id,] l_<key>, r_<key>, l_<out_attrs...>, r_<out_attrs...> [, _sim_score]``.

Out-attrs are attached by joining the (small) match-pair table back to the
base tables **after** verification — matches ≪ candidates, so these joins are
cheap and usually broadcast-able on the pair side. ``_id``: the reference
emits a dense 0..n-1 id UNCONDITIONALLY
(/root/reference/py_stringsimjoin/join/jaccard_join_py.py:210-211); here it
needs a global row_number (single-partition window) — fine for parity tests,
wrong at 10^12 rows, where the (l_key, r_key) natural key is the identity
(SURVEY.md §4.1 "Deterministic _id"). So it is conf-driven: per-call
``add_dense_id=True/False`` wins; the default (``None``) reads the session
conf ``spark.py_stringsimjoin.parity.denseId`` (default off). Set that conf
to ``true`` to get the reference's exact column layout from every join /
filter_tables call without touching call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def remove_redundant_attrs(out_attrs, key_attr):
    # mirror of utils/generic_helper.py:129-144 — key is always emitted
    if out_attrs is None:
        return []
    return [a for a in out_attrs if a != key_attr]


def assemble_output(
    pairs: DataFrame,
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_out_attrs=None,
    r_out_attrs=None,
    l_out_prefix: str = "l_",
    r_out_prefix: str = "r_",
    sim_score_col: str | None = "_sim_score",
    add_dense_id: bool | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """pairs has columns (_l_key, _r_key [, sim_score_col] [, extra_cols]).

    ``extra_cols``: additional pair-level columns (e.g. the top-k join's
    ``_rank``) carried through to the output, after the sim score."""
    if add_dense_id is None:
        add_dense_id = (
            str(
                pairs.sparkSession.conf.get(
                    "spark.py_stringsimjoin.parity.denseId", "false"
                )
            ).lower()
            == "true"
        )
    l_out = remove_redundant_attrs(l_out_attrs, l_key_attr)
    r_out = remove_redundant_attrs(r_out_attrs, r_key_attr)

    out = pairs
    if l_out:
        lsel = ltable.select(
            F.col(l_key_attr).alias("_l_key"),
            *[F.col(a).alias(f"{l_out_prefix}{a}") for a in l_out],
        )
        out = out.join(lsel, "_l_key", "left")
    if r_out:
        rsel = rtable.select(
            F.col(r_key_attr).alias("_r_key"),
            *[F.col(a).alias(f"{r_out_prefix}{a}") for a in r_out],
        )
        out = out.join(rsel, "_r_key", "left")

    cols = [
        F.col("_l_key").alias(f"{l_out_prefix}{l_key_attr}"),
        F.col("_r_key").alias(f"{r_out_prefix}{r_key_attr}"),
    ]
    cols += [F.col(f"{l_out_prefix}{a}") for a in l_out]
    cols += [F.col(f"{r_out_prefix}{a}") for a in r_out]
    if sim_score_col is not None and sim_score_col in pairs.columns:
        cols.append(F.col(sim_score_col))
    for c in extra_cols or []:
        cols.append(F.col(c))
    result = out.select(*cols)
    if add_dense_id:
        w = Window.orderBy(*result.columns[:2])
        result = result.withColumn("_id", F.row_number().over(w) - 1).select(
            "_id", *result.columns
        )
    return result
