"""Dictionary (gazetteer) phrase tagging — count/flag known phrases per doc.

The curation-pipeline counterpart of PII regex scrubbing
(operators/pii.py) for LITERAL phrase lists: blocklists, brand/entity
gazetteers, safety term lists, boilerplate markers. Emits per-(doc,
phrase) hit counts for every dictionary phrase found. Beyond-reference
(SURVEY.md §2.5).

Two physical paths:

* ``method="expr"`` — one JVM expression per phrase computing the greedy
  non-overlapping occurrence count via the replace-length identity
  ``(len(t) − len(replace(t, p, ''))) / len(p)`` — zero Python, exact,
  and reproducible verbatim in SQL (the oracle path). Cost is
  O(|doc| · |dict|): right for dictionaries up to a few hundred phrases
  (the plan is a map-only projection; each phrase is one codegen'd scan).
* ``method="aho"`` — one Arrow ``mapInPandas`` pass running an
  Aho–Corasick automaton (built once per worker from the broadcast
  dictionary): O(|doc| + hits) per document regardless of dictionary
  size — the production path for 10⁴–10⁶-phrase gazetteers. Counts
  EVERY match position (overlapping occurrences included), which is the
  automaton's natural semantics.

The two paths differ exactly when a phrase can overlap itself
(``"aa" in "aaa"``: expr counts 1 greedy, aho counts 2); pytest pins both
behaviors. Case folding is the caller's choice via ``lowercase``.

Scale shape (100 TB test): both paths are MAP-ONLY over the corpus — no
join, no shuffle; output is one row per (doc, matched phrase), bounded by
hits. The dictionary travels as a broadcast/literal, never as a join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.validation import validate_attr, validate_attr_type


def dictionary_tag(
    df: DataFrame,
    id_attr: str,
    text_attr: str,
    phrases: list[str],
    lowercase: bool = True,
    method: str = "expr",
) -> DataFrame:
    """(id, phrase, n_hits) for every dictionary phrase occurring in each
    document (rows only for hits; n_hits ≥ 1)."""
    validate_attr(df, id_attr, "df")
    validate_attr(df, text_attr, "df")
    validate_attr_type(df, text_attr, "df")
    phrases = list(phrases)
    if not phrases:
        raise AssertionError("phrases must be non-empty")
    if any(not p for p in phrases):
        raise AssertionError("phrases must be non-empty strings")
    if len(set(phrases)) != len(phrases):
        raise AssertionError("phrases must be unique")
    if method not in ("expr", "aho"):
        raise AssertionError(f"unknown method {method!r}")
    plist = [p.lower() for p in phrases] if lowercase else phrases
    if len(set(plist)) != len(plist):
        raise AssertionError("phrases collide after lowercasing")

    t = F.col(text_attr)
    if lowercase:
        t = F.lower(t)

    if method == "expr":
        counts = [
            (
                (F.char_length(t) - F.char_length(F.replace(t, F.lit(p))))
                / F.lit(len(p))
            ).cast("long").alias(f"_c{i}")
            for i, p in enumerate(plist)
        ]
        wide = df.select(F.col(id_attr).alias("id"), *counts)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(p).alias("phrase"), F.col(f"_c{i}").alias("n_hits")
                )
                for i, p in enumerate(plist)
            ]
        )
        return (
            wide.select(
                "id", F.explode(F.filter(pairs, lambda s: s["n_hits"] > 0)).alias("_h")
            )
            .select("id", F.col("_h.phrase").alias("phrase"), F.col("_h.n_hits").alias("n_hits"))
        )

    # Aho–Corasick batch kernel: automaton built once per worker process
    spark = df.sparkSession
    bp = spark.sparkContext.broadcast(plist)
    id_type = df.schema[id_attr].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("phrase", T.StringType()),
            T.StructField("n_hits", T.LongType()),
        ]
    )
    lc = lowercase

    def build_automaton(words):
        # goto / fail / output tables over a dict-of-dicts trie
        trie = [{}]
        out = [set()]
        for w in words:
            node = 0
            for ch in w:
                nxt = trie[node].get(ch)
                if nxt is None:
                    trie.append({})
                    out.append(set())
                    nxt = len(trie) - 1
                    trie[node][ch] = nxt
                node = nxt
            out[node].add(w)
        from collections import deque

        fail = [0] * len(trie)
        q = deque(trie[0].values())
        while q:
            u = q.popleft()
            for ch, v in trie[u].items():
                q.append(v)
                f = fail[u]
                while f and ch not in trie[f]:
                    f = fail[f]
                fail[v] = trie[f].get(ch, 0) if trie[f].get(ch, 0) != v else 0
                out[v] |= out[fail[v]]
        return trie, fail, out

    def fn(batches):
        import pandas as pd

        trie, fail, out = build_automaton(bp.value)
        for pdf in batches:
            ids, phs, ns = [], [], []
            for rid, text in zip(pdf[id_attr], pdf[text_attr]):
                if text is None:
                    continue
                s = str(text).lower() if lc else str(text)
                node = 0
                hits: dict = {}
                for ch in s:
                    while node and ch not in trie[node]:
                        node = fail[node]
                    node = trie[node].get(ch, 0)
                    for w in out[node]:
                        hits[w] = hits.get(w, 0) + 1
                for w, c in hits.items():
                    ids.append(rid)
                    phs.append(w)
                    ns.append(c)
            yield pd.DataFrame({"id": ids, "phrase": phs, "n_hits": ns})

    return df.select(id_attr, text_attr).mapInPandas(fn, schema)
