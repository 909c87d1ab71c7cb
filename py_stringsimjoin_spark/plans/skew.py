"""Hot-token skew handling for exploding equi-joins.

The prefix/count token joins at the heart of the engine explode rows by
token and hash-join on token rank. On web text the token frequencies are
Zipfian: the hottest tokens produce join outputs quadratic in their
frequency, all inside ONE hash partition. AQE's skew-join split cannot help
— it splits partitions by *input* bytes, and an exploding join's input is
tiny while its output is enormous (measured here: a 16-token vocabulary at
sf0.1 serializes the whole join into ~2 tasks, one of which runs for
minutes).

The engine fixes this with *measured-frequency salting*: the global token
ordering already counts every token's frequency, so the joins ask for the
provably-hot ranks (at most ``partitions`` of them — tokens with
freq > sqrt(Σf²/P)) and salt exactly those:

* probe side: hot-token rows get ``salt = hash(row_key) % S``;
* build side: hot-token rows are replicated to all S salts (cold rows pay
  nothing — one extra int column).

Each (l_row, r_row, token) match meets in exactly one salt bucket, so the
join output is identical; the hot token's work is now spread over S tasks.
Both sides are repartitioned with an explicit numPartitions so AQE's
byte-based coalescing cannot re-serialize the expansion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_token_ranks(ordering: DataFrame, partitions: int) -> list[int]:
    """Ranks whose frequency exceeds sqrt(Σf²/partitions).

    Σf² is the total join work; a token above the cutoff contributes more
    than an even share of one partition. At most ``partitions`` ranks can
    exceed the cutoff, so the collect is bounded and tiny. Requires the
    ordering to carry ``_freq`` (build_token_ordering provides it)."""
    if "_freq" not in ordering.columns:
        return []
    f = F.col("_freq").cast("double")
    # build_token_ordering stashes Σf² on the DataFrame it returns — when
    # present this function costs ONE tiny bounded collect instead of an
    # extra aggregation pass over the vocabulary
    stats = getattr(ordering, "_ssj_vocab_stats", None)
    if stats is not None:
        w = stats["sum_f2"] or 0.0
    else:
        w = ordering.agg(F.sum(f * f).alias("w")).first()["w"] or 0.0
    if w <= 0:
        return []
    cutoff = (w / max(partitions, 1)) ** 0.5
    return [
        r["rank"]
        for r in ordering.where(f > F.lit(cutoff)).select("rank").collect()
    ]


def salted_token_join(
    ex_l: DataFrame,
    ex_r: DataFrame,
    hot_ranks: list[int],
    n_salts: int,
    l_salt_key: str,
    tok_col: str = "_tok",
    pin_partitions: int | None = None,
) -> DataFrame:
    """Equi-join two exploded token tables on ``tok_col`` with hot-rank
    salting. With no hot ranks this is a plain join (zero overhead)."""
    if not hot_ranks or n_salts <= 1:
        return ex_l.join(ex_r, tok_col)
    is_hot_l: Column = F.col(tok_col).isin(hot_ranks)
    l2 = ex_l.withColumn(
        "_salt",
        F.when(
            is_hot_l,
            F.pmod(F.xxhash64(F.col(l_salt_key)), F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    # sequence/array of int literals → array<int>, so the exploded salt is
    # already int (a cast around explode would nest the generator)
    r2 = ex_r.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col(tok_col).isin(hot_ranks),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    if pin_partitions:
        # user-specified numPartitions: AQE will not coalesce these exchanges
        l2 = l2.repartition(pin_partitions, F.col(tok_col), F.col("_salt"))
        r2 = r2.repartition(pin_partitions, F.col(tok_col), F.col("_salt"))
    return l2.join(r2, [tok_col, "_salt"]).drop("_salt")
