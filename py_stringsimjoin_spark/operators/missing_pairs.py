"""allow_missing pair generation.

Re-expresses /root/reference/py_stringsimjoin/utils/missing_value_handler.py:10-92:
every (l-row with NULL join attr × all r-rows) plus (r-row with NULL join attr
× l-rows with non-NULL join attr), with NULL similarity score (the reference's
short-row/NaN-pad quirk is normalized to NULL score for *all* missing pairs —
SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_pairs(
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_join_attr: str,
    r_join_attr: str,
) -> DataFrame:
    """Returns (_l_key, _r_key, _sim_score=NULL double)."""
    l_null = ltable.where(F.col(l_join_attr).isNull()).select(
        F.col(l_key_attr).alias("_l_key")
    )
    r_all = rtable.select(F.col(r_key_attr).alias("_r_key"))
    p1 = l_null.crossJoin(r_all)
    r_null = rtable.where(F.col(r_join_attr).isNull()).select(
        F.col(r_key_attr).alias("_r_key")
    )
    l_nn = ltable.where(F.col(l_join_attr).isNotNull()).select(
        F.col(l_key_attr).alias("_l_key")
    )
    p2 = l_nn.crossJoin(r_null)
    return p1.unionByName(p2).withColumn("_sim_score", F.lit(None).cast("double"))
