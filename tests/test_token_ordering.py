import collections

from pyspark.sql import functions as F

from py_stringsimjoin_spark.functions.tokenizers import QgramTokenizer
from py_stringsimjoin_spark.operators.token_ordering import build_token_ordering


def _expected(df):
    cnt = collections.Counter()
    for arr in df.toPandas()["_tokens"]:
        if arr is not None:
            cnt.update(arr)
    return sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))


def _check(ordering_df, expect):
    got = ordering_df.toPandas().sort_values("rank").reset_index(drop=True)
    assert list(got["token"]) == [t for t, _ in expect]
    assert list(got["rank"]) == list(range(len(expect)))
    assert list(got["_freq"]) == [c for _, c in expect]


def test_ordering_small_and_distributed_paths_agree(spark, person_tables):
    """Driver-side (small vocab) and two-phase distributed rank must produce
    the identical dense (count, token) ordering."""
    A, _ = person_tables
    tok = QgramTokenizer(qval=2, return_set=False)
    df = A.where(F.col("name").isNotNull()).select(
        tok.spark_col(F.col("name")).alias("_tokens")
    )
    expect = _expected(df)
    small = build_token_ordering([(df, "_tokens")])
    _check(small, expect)
    # force the distributed range-partition + window + offsets path
    dist = build_token_ordering([(df, "_tokens")], small_vocab_threshold=0)
    _check(dist, expect)
