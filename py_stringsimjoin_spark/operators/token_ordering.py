"""Global document-frequency token ordering.

Spark-first re-expression of the reference's per-call Python dict ordering
(/root/reference/py_stringsimjoin/utils/token_ordering.py:24-55): tokens are
replaced by integer ranks from one **global** frequency ordering (rarest →
smallest rank, ties broken by token string). Unlike the reference — which
recomputes the ordering per joblib split, giving split-dependent prefixes
(SURVEY.md §3.1) — we compute one ordering over all inputs: deterministic and
strictly better pruning.

Scale notes: the ordering is a (token, rank) table built by a distributed
groupBy + sort; rank assignment uses ``rdd.zipWithIndex`` (two passes, fully
distributed — no single-partition window). Applying the ordering is a shuffle
join on token followed by a groupBy re-collect; at 10^12-doc scale both are
plain shuffles that AQE can size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def build_token_ordering(token_sources: list[tuple[DataFrame, str]]) -> DataFrame:
    """(df, tokens_col) pairs -> DataFrame(token: string, rank: long).

    Frequency counts each token occurrence (bag occurrences count, matching
    utils/token_ordering.py:26-32); rank ascends with (count, token).
    """
    counted = None
    for df, tokens_col in token_sources:
        toks = df.select(F.explode(F.col(tokens_col)).alias("token"))
        counted = toks if counted is None else counted.unionByName(toks)
    freq = counted.groupBy("token").agg(F.count("*").alias("_freq"))
    spark = freq.sparkSession
    ranked_rdd = (
        freq.select("token", "_freq")
        .sort(F.col("_freq").asc(), F.col("token").asc())
        .rdd.map(lambda r: r[0])
        .zipWithIndex()
    )
    schema = T.StructType(
        [
            T.StructField("token", T.StringType(), False),
            T.StructField("rank", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(ranked_rdd, schema)


def add_ranked_tokens(
    df: DataFrame,
    key_cols: list[str],
    tokens_col: str,
    ordering: DataFrame,
    out_col: str = "_ranked",
    size_col: str = "_size",
) -> DataFrame:
    """Attach a sorted int-rank array + its size to each row.

    Rows whose token array is empty (or NULL) get an empty ranked array and
    size 0/NULL-size-0; ``key_cols`` must uniquely identify rows. Duplicate
    tokens (bag semantics) keep their multiplicity.
    """
    ex = df.select(*key_cols, F.explode(F.col(tokens_col)).alias("_tok"))
    ranked = (
        ex.join(ordering, ex["_tok"] == ordering["token"], "inner")
        .groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("rank")).alias(out_col))
    )
    out = (
        df.join(ranked, key_cols, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.array().cast("array<long>")))
        .withColumn(size_col, F.size(out_col))
    )
    return out
