"""Scan-parallelism guards (guide §6: input split sizing).

The per-row map work of several operators (tokenize + per-token md5 +
explode + partial aggregation) runs in the SCAN stage, before the first
exchange — so its parallelism is bounded by the input split count, not by
the session's shuffle sizing. On a small-file corpus (one sub-128 MB
parquet file = one split) that serializes the whole hashing pass onto a
single task regardless of core count (measured here: the minhash signature
map stage ran 6.4 s on ONE task at local[32] over a 0.6 MB input; the same
shape cost winnowing 17.9 s before round 5's local fix).

``widen_small_scan`` repartitions the input up to the session's shuffle
parallelism ONLY when the scan is narrower than that — at production scale
file splits already provide the parallelism and this is a structural
no-op; when it does fire, the exchange moves the raw rows once (bounded by
the small input that caused the problem in the first place).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the shuffle parallelism when the plan's
    current partitioning is narrower; identity otherwise (the production
    case). Use on inputs about to pay heavy per-row map work that feeds a
    shuffle."""
    n = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
