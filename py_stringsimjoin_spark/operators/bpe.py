"""Byte-pair-encoding tokenizer training and application, Spark-native.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units" (ACL 2016): start from characters (+ an end-of-word
marker), repeatedly merge the most frequent adjacent symbol pair. The
canonical LLM-pipeline vocabulary-induction pass; beyond-reference
(SURVEY.md §2.5 — the reference tokenizes, it never *learns* a
tokenizer).

Scale shape (100 TB test): training never touches the corpus after ONE
word-count aggregation — the loop runs on the (word, count) VOCAB table,
which is Zipf-bounded (millions of rows at web scale, not trillions).
Each of the ``num_merges`` iterations is one partial-aggregated pair-count
job + a driver collect of exactly ONE row (the argmax pair — the bounded
plan-time-collect carve-out) + one map-only merge rewrite; the vocab is
re-persisted per iteration so lineage stays O(1). Iteration count is the
knob, independent of corpus size. ``apply_bpe`` is a single Arrow
``mapInPandas`` pass with the standard rank-greedy merge loop per word
(the production shape of every tokenizer runtime).

Determinism / oracle form: symbol sequences are flat strings —
``SEP tok SEP SEP tok SEP`` with SEP = U+001F (words containing SEP are
excluded, by filter, on both engines) — so "merge every adjacent
occurrence, left to right, non-overlapping" is exactly ONE
``replace(seq, SEP·a·SEP·SEP·b·SEP → SEP·ab·SEP)`` call, which Spark and
DuckDB scan identically. Pair counts are integer sums; the argmax breaks
ties (count DESC, left ASC, right ASC). The WHOLE training loop is
therefore replayable as a chain of generated SQL CTE stages
(``train_bpe_oracle_sql``) and hash-matches the driver oracle — an
iterative algorithm with a closed-form SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.validation import validate_attr, validate_attr_type

SEP = "\x1f"
_SEP2 = SEP + SEP
EOW = "</w>"


def _word_vocab(df: DataFrame, text_attr: str) -> DataFrame:
    """(cnt, seq): whitespace-word counts with the flat symbol-string
    representation seeded at characters + EOW."""
    words = (
        df.select(F.col(text_attr).alias("_t"))
        .where(F.col("_t").isNotNull())
        .select(
            F.explode(
                F.filter(F.split(F.trim("_t"), r"\s+"), lambda t: t != "")
            ).alias("_w")
        )
        .where(~F.col("_w").contains(SEP))
    )
    counts = words.groupBy("_w").agg(F.count(F.lit(1)).alias("cnt"))
    chars = F.transform(
        F.sequence(F.lit(1), F.char_length("_w")),
        lambda i: F.col("_w").substr(i, F.lit(1)),
    )
    seq = F.concat(
        F.lit(SEP),
        F.array_join(F.concat(chars, F.array(F.lit(EOW))), _SEP2),
        F.lit(SEP),
    )
    return counts.select("cnt", seq.alias("seq"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    syms = F.split(
        F.col("seq").substr(F.lit(2), F.char_length("seq") - 2), _SEP2
    )
    return (
        vocab.withColumn("_s", syms)
        .where(F.size("_s") >= 2)
        .select(
            "cnt",
            F.explode(F.sequence(F.lit(1), F.size("_s") - 1)).alias("_i"),
            "_s",
        )
        .select(
            F.element_at("_s", F.col("_i")).alias("lhs"),
            F.element_at("_s", F.col("_i") + 1).alias("rhs"),
            "cnt",
        )
        .groupBy("lhs", "rhs")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def train_bpe(
    df: DataFrame,
    text_attr: str,
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from the corpus; returns the
    ordered list ``[(lhs, rhs, pair_count), ...]``. Stops early when no
    pair reaches ``min_pair_count``."""
    validate_attr(df, text_attr, "df")
    validate_attr_type(df, text_attr, "df")
    if not (num_merges >= 1 and min_pair_count >= 1):
        raise AssertionError("require num_merges >= 1 and min_pair_count >= 1")
    vocab = _word_vocab(df, text_attr).persist()
    prev: DataFrame | None = None
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(num_merges):
            # this argmax job materializes vocab's cache; only THEN is the
            # previous generation droppable (one job per iteration total —
            # no separate count() materialization pass)
            best = (
                _pair_counts(vocab)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("lhs").asc(),
                    F.col("rhs").asc(),
                )
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best or best[0]["pair_count"] < min_pair_count:
                break
            a, b, c = best[0]["lhs"], best[0]["rhs"], int(best[0]["pair_count"])
            merges.append((a, b, c))
            nxt = vocab.withColumn(
                "seq",
                F.replace(
                    F.col("seq"),
                    F.lit(SEP + a + _SEP2 + b + SEP),
                    F.lit(SEP + a + b + SEP),
                ),
            ).persist()
            prev, vocab = vocab, nxt
    finally:
        vocab.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def train_bpe_df(
    df: DataFrame,
    text_attr: str,
    num_merges: int,
    min_pair_count: int = 2,
) -> DataFrame:
    """``train_bpe`` as a (rank, lhs, rhs, pair_count) DataFrame — the
    merges are few by definition (the tokenizer's vocab budget)."""
    spark = df.sparkSession
    merges = train_bpe(df, text_attr, num_merges, min_pair_count)
    schema = T.StructType(
        [
            T.StructField("rank", T.LongType()),
            T.StructField("lhs", T.StringType()),
            T.StructField("rhs", T.StringType()),
            T.StructField("pair_count", T.LongType()),
        ]
    )
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(rows, schema)


def train_bpe_oracle_sql(
    source_sql: str, text_col: str, num_merges: int
) -> str:
    """Generated SQL replaying the exact training loop: one CTE pair per
    merge (pair-count argmax + replace rewrite). For the cross-engine
    oracle; assumes no early stop within ``num_merges`` (pick a budget the
    corpus supports)."""
    sep, sep2 = SEP, _SEP2
    parts = [
        f"""v0 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS cnt,
         '{sep}' || array_to_string(
             list_transform(range(1, length(w) + 1), i -> w[i]) || ['{EOW}'],
             '{sep2}') || '{sep}' AS seq
  FROM (
    SELECT unnest(list_filter(string_split_regex(trim({text_col}), '\\s+'),
                              x -> x <> '')) AS w
    FROM ({source_sql}) WHERE {text_col} IS NOT NULL
  )
  WHERE w NOT LIKE '%{sep}%'
  GROUP BY w
)"""
    ]
    for i in range(num_merges):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT s[i] AS lhs, s[i + 1] AS rhs, sum(cnt)::BIGINT AS pair_count
  FROM (
    SELECT cnt, s, unnest(range(1, len(s))) AS i
    FROM (SELECT cnt,
                 str_split(substr(seq, 2, length(seq) - 2), '{sep2}') AS s
          FROM v{i})
    WHERE len(s) >= 2
  ) GROUP BY 1, 2
), b{i} AS MATERIALIZED (
  SELECT lhs, rhs, pair_count FROM p{i}
  ORDER BY pair_count DESC, lhs, rhs LIMIT 1
), v{i + 1} AS MATERIALIZED (
  SELECT cnt,
         replace(seq, '{sep}' || lhs || '{sep2}' || rhs || '{sep}',
                      '{sep}' || lhs || rhs || '{sep}') AS seq
  FROM v{i} CROSS JOIN b{i}
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i + 1}::BIGINT AS rank, lhs, rhs, pair_count FROM b{i}"
        for i in range(num_merges)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


def apply_bpe(
    df: DataFrame,
    id_attr: str,
    text_attr: str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>, n_tokens): tokenize each document with
    the learned merges — whitespace pre-split, then the standard
    rank-greedy merge loop per word inside one Arrow batch pass."""
    validate_attr(df, id_attr, "df")
    validate_attr(df, text_attr, "df")
    validate_attr_type(df, text_attr, "df")
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    id_type = df.schema[id_attr].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) >= 2:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            # merge every occurrence of this pair, left to right
            a, b = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    def fn(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for rid, text in zip(pdf[id_attr], pdf[text_attr]):
                if text is None:
                    ids.append(rid)
                    toks.append(None)
                    ns.append(0)
                    continue
                words = [w for w in str(text).split() if w and SEP not in w]
                enc: list[str] = []
                for w in words:
                    enc.extend(encode_word(w, cache))
                ids.append(rid)
                toks.append(enc)
                ns.append(len(enc))
            yield pd.DataFrame({"id": ids, "tokens": toks, "n_tokens": ns})

    return df.select(id_attr, text_attr).mapInPandas(fn, schema)
