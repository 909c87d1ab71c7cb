"""Deterministic synthetic Common-Crawl-style pages source.

The driver contract (/root/repo/BASELINE.json input_hint) fixes the input
shape: ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``. No external data exists in the sandbox, so this module
synthesizes a seeded corpus with known ground-truth duplicate clusters
(FIXTURES.md §1): each base page emits 0-4 near-duplicate variants (token
drops/swaps, small char edits, url path perturbations) whose cluster id is
known at generation time.

Generation is distributed: ``spark.range(n)`` + ``mapInPandas`` — every row is
a pure function of (seed, row id), so the corpus is identical at any
parallelism and any partitioning (deterministic under retries).

``extract_text(html)`` is the pure extraction function; by construction
``text == extract_text(html)`` byte-for-byte per url (the per-row invariant in
BASELINE.json). A Spark-native column version (``extract_text_col``) exists so
the pipeline's extract stage runs JVM-side.
"""

from __future__ import annotations


import random
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Zipf-like vocabulary: word index drawn log-uniformly from [1, VOCAB_SIZE]
# (P(idx ≤ x) = log x / log V — density ∝ 1/x). Web text is Zipfian; the long
# tail of rare words is what makes prefix blocking selective. A small flat
# vocabulary would make every token a hot token and candidate generation
# quadratic — unrepresentative of the Common-Crawl shape this stands in for.
VOCAB_SIZE = 50_000
_COMMON = (
    "the a of and to in is that for with data web page crawl index token "
    "rank merge shard fetch parse render link host path query cache store"
).split()


def _zipf_word(rng: random.Random) -> str:
    idx = int(VOCAB_SIZE ** rng.random())
    if idx <= len(_COMMON):
        return _COMMON[idx - 1]
    return f"w{idx:05d}"


LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh"]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), False),
        T.StructField("cluster_id", T.LongType(), False),  # ground truth (truth split)
    ]
)

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def extract_text(html: bytes) -> str | None:
    """Pure, deterministic text extraction: title line + body line."""
    if html is None:
        return None
    t = _TITLE_RE.search(html)
    p = _P_RE.search(html)
    title = t.group(1).decode("utf-8") if t else ""
    body = p.group(1).decode("utf-8") if p else ""
    return title + "\n" + body


def extract_title(html: bytes) -> str | None:
    """Title-only extraction (the north star blocks on titles/urls/text)."""
    if html is None:
        return None
    t = _TITLE_RE.search(html)
    return t.group(1).decode("utf-8") if t else ""


def extract_title_col(html_col) -> "F.Column":
    """JVM-side equivalent of ``extract_title``."""
    return F.regexp_extract(
        F.decode(html_col, "UTF-8"), r"<title>([\s\S]*?)</title>", 1
    )


def extract_text_col(html_col) -> "F.Column":
    """JVM-side equivalent of ``extract_text`` (regexp on decoded bytes)."""
    s = F.decode(html_col, "UTF-8")
    title = F.regexp_extract(s, r"<title>([\s\S]*?)</title>", 1)
    body = F.regexp_extract(s, r"<p>([\s\S]*?)</p>", 1)
    return F.concat(title, F.lit("\n"), body)


def _make_html(title: str, body: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{body}</p></body></html>"
    ).encode("utf-8")


def _base_page(rng: random.Random, base_id: int):
    title = " ".join(_zipf_word(rng) for _ in range(rng.randint(4, 8)))
    body = " ".join(_zipf_word(rng) for _ in range(rng.randint(30, 60)))
    host = f"site{rng.randint(0, 99)}.example.com"
    path = f"/{rng.choice(['a', 'b', 'c', 'docs', 'blog'])}/{base_id}"
    lang = rng.choice(LANGS)
    return title, body, host, path, lang


def _perturb(rng: random.Random, title: str, body: str):
    """Near-duplicate edit: keeps >=85% token overlap; never touches the
    first title token (the blocking key)."""
    t_toks = title.split()
    b_toks = body.split()
    op = rng.randint(0, 3)
    if op == 0 and len(b_toks) > 2:  # drop a body token
        b_toks.pop(rng.randrange(1, len(b_toks)))
    elif op == 1 and len(b_toks) > 3:  # swap two body tokens
        i = rng.randrange(1, len(b_toks) - 1)
        b_toks[i], b_toks[i + 1] = b_toks[i + 1], b_toks[i]
    elif op == 2 and len(t_toks) > 2:  # small char edit in a late title token
        i = rng.randrange(1, len(t_toks))
        w = t_toks[i]
        if len(w) > 2:
            j = rng.randrange(len(w))
            t_toks[i] = w[:j] + rng.choice("xyz") + w[j + 1 :]
    else:  # append a body token
        b_toks.append(_zipf_word(rng))
    return " ".join(t_toks), " ".join(b_toks)


def _rows_for_base(seed: int, base_id: int, dup_fraction: float):
    rng = random.Random(f"{seed}:{base_id}")
    title, body, host, path, lang = _base_page(rng, base_id)
    n_variants = rng.randint(1, 4) if rng.random() < dup_fraction else 0
    out = []
    ts_base = 1_600_000_000 + base_id * 97
    for v in range(n_variants + 1):
        if v == 0:
            t, b, p = title, body, path
        else:
            t, b = _perturb(rng, title, body)
            p = f"{path}-v{v}" if rng.random() < 0.5 else f"{path}?ref={v}"
        text = t + "\n" + b
        html = _make_html(t, b)
        out.append(
            (
                f"https://{host}{p}",
                ts_base + v * 3600,
                html,
                text,
                lang,
                base_id,
            )
        )
    return out


def generate_pages(
    spark: SparkSession,
    n_base: int = 1000,
    dup_fraction: float = 0.35,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus with ground-truth ``cluster_id``.

    Column set = driver schema + ``cluster_id``; callers building the
    pipeline input should ``.drop('cluster_id')`` and keep the truth split.
    """
    import pandas as pd

    base = spark.range(0, n_base, 1, num_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            recs = []
            for bid in pdf["id"]:
                recs.extend(_rows_for_base(seed, int(bid), dup_fraction))
            out = pd.DataFrame(
                recs, columns=["url", "warc_ts", "html", "text", "lang", "cluster_id"]
            )
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], unit="s")
            yield out

    return base.mapInPandas(gen, PAGES_SCHEMA)


def labeled_pairs(pages_with_truth: DataFrame, n_negatives_per_pos: int = 1) -> DataFrame:
    """(l_url, r_url, is_match) over pairs sharing the blocking key
    (first title token). Positives: same cluster. Negatives: deterministic
    same-block different-cluster pairs."""
    p = pages_with_truth.select(
        "url",
        "cluster_id",
        F.split(F.split("text", "\n")[0], " ")[0].alias("block_key"),
    )
    a = p.select(
        F.col("url").alias("l_url"),
        F.col("cluster_id").alias("l_cid"),
        F.col("block_key"),
    )
    b = p.select(
        F.col("url").alias("r_url"),
        F.col("cluster_id").alias("r_cid"),
        F.col("block_key"),
    )
    pairs = a.join(b, "block_key").where(F.col("l_url") < F.col("r_url"))
    pos = pairs.where(F.col("l_cid") == F.col("r_cid")).withColumn(
        "is_match", F.lit(1)
    )
    neg = (
        pairs.where(F.col("l_cid") != F.col("r_cid"))
        .withColumn("h", F.abs(F.hash("l_url", "r_url")) % 100)
        .where(F.col("h") < 5)  # deterministic sample of same-block negatives
        .drop("h")
        .withColumn("is_match", F.lit(0))
    )
    return pos.unionByName(neg).select("l_url", "r_url", "is_match")
