"""Weighted sampling without replacement — deterministic, float-free.

Draw ``k`` rows with inclusion probability proportional to an INTEGER
weight column (length-proportional document sampling for training mixes,
impression-weighted URL draws, cluster-size-weighted audits). This is the
Efraimidis–Spirakis A-Res scheme (IPL 2006) in its discrete form: item i
with weight w_i exposes w_i replica draws; its KEY is the minimum draw,
and the k smallest keys win. P(item takes the next slot) = w_i / Σw —
exactly sequential weighted sampling without replacement.

The A-Res paper ranks by u^(1/w) (or ln(u)/w) — transcendental functions
whose last-ulp disagreement across engines (the operators/bm25.py Java
Math.log story) would make a hash oracle flaky. The discrete form needs
NO floats anywhere: draws are md5(seed|id|replica) hex strings compared
lexicographically (the operators/splits.py idiom), the per-item min is a
string aggregate, and the final top-k is a string sort — every engine
orders ASCII hex identically, so the sample hash-matches bit-for-bit.

Scale shape (100 TB test): the replica explode is bounded by Σw — with
w = token count that is one tokenization-sized map stage (the engine's
standard explode budget), partial-aggregated per item before the shuffle
(min combines map-side). The global top-k is TakeOrdered (per-partition
heads + a k-row driver merge), never a full sort. Weights are capped by
``max_weight`` (default 10^6 replicas/row) to bound single-row explode
width; cap-clipped rows keep weight = cap (documented, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def weighted_sample(
    df: DataFrame,
    id_attr: str,
    weight_attr: str,
    k: int,
    seed: int = 42,
    max_weight: int = 1_000_000,
) -> DataFrame:
    """(id, weight, draw_rank): the ``k`` winners. Rows with NULL or
    non-positive weight never win; weights clip at ``max_weight``."""
    validate_attr(df, id_attr, "df")
    validate_attr(df, weight_attr, "df")
    if not (k >= 1 and max_weight >= 1):
        raise AssertionError("require k >= 1 and max_weight >= 1")
    # filter BEFORE the cap: least() in both Spark and DuckDB skips NULL
    # operands, so least(NULL, cap) would resurrect NULL-weight rows at
    # full cap weight
    raw = F.col(weight_attr).cast("long")
    base = (
        df.select(F.col(id_attr).alias("id"), raw.alias("_w"))
        .where(F.col("_w").isNotNull() & (F.col("_w") > 0))
        .select("id", F.least(F.col("_w"), F.lit(int(max_weight))).alias("weight"))
    )
    draws = base.select(
        "id",
        "weight",
        F.explode(F.sequence(F.lit(1), F.col("weight"))).alias("_r"),
    ).select(
        "id",
        "weight",
        F.md5(
            F.concat(
                F.lit(f"{seed}|"),
                F.col("id").cast("string"),
                F.lit("|"),
                F.col("_r").cast("string"),
            )
        ).alias("_d"),
    )
    keys = draws.groupBy("id").agg(
        F.first("weight").alias("weight"), F.min("_d").alias("_key")
    )
    top = keys.orderBy(F.col("_key").asc(), F.col("id").asc()).limit(int(k))
    wnd = Window.orderBy(F.col("_key").asc(), F.col("id").asc())
    return top.withColumn("draw_rank", F.row_number().over(wnd).cast("long")).select(
        "id", "weight", "draw_rank"
    )
