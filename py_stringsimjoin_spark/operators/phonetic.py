"""Phonetic (soundex) encoding + blocking — a cross-engine expression spec.

Classic ER blocking key (Hernández–Stolfo, Census linkage): records whose
names SOUND alike share a 4-char code, so typos that change letters but not
phonetics ("Robert"/"Rupert" → R163) land in the same block. The reference
engine has no phonetic surface; py_stringmatching (its companion) ships
Soundex as a pairwise measure — here it is re-expressed as a BLOCKING KEY,
which is the scalable form: an equi-join on the code instead of a pairwise
scan.

The encoding is built ONLY from ``upper``/``translate``/``regexp_replace``/
``substring``/``rpad`` — functions with identical semantics in Spark and
DuckDB — so driver queries oracle exactly (Spark's builtin ``F.soundex``
follows a slightly different H/W spec and has no DuckDB mirror). Steps
(American Soundex, US-Census H/W rule):

1. keep A–Z of the uppercased input,
2. first letter kept verbatim; its code (H/W → sentinel ``7``) is prefixed
   to the remaining letters' codes (vowels+Y → ``0``, H/W deleted — this
   makes same-code letters separated by H/W ADJACENT, so step 3 codes them
   once, while a separating vowel keeps them apart → coded twice),
3. collapse runs of equal digits,
4. drop the first code (the letter itself is kept), drop the vowel ``0``s,
5. first letter + first 3 digits, right-padded with ``0``.

Verified against the canonical vectors (Robert→R163, Tymczak→T522,
Pfister→P236, Ashcraft→A261, Honeyman→H555) in tests.

Scale shape: the code is one whole-stage-codegen projection; blocking is a
hash equi-join on a 4-char key. Hot codes (very common name sounds) are a
skew concern exactly like hot tokens — at scale feed the pairs through the
same salting machinery the set-sim joins use, or cap blocks with
``max_block_size``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FROM = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_TO_FIRST = "11112222222233455600000077"  # H,W → sentinel 7 (never merges)
_TO_REST = "111122222222334556000000"  # H,W deleted

_BIG = 1 << 30  # "rest of string" length for substring()


def soundex_column(col: Column) -> Column:
    """4-char soundex code; NULL→NULL, no-letter input → ''."""
    u = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    fl = F.substring(u, 1, 1)
    flc = F.translate(fl, _FROM, _TO_FIRST)
    rc = F.translate(F.substring(u, 2, _BIG), _FROM, _TO_REST)
    # collapse digit runs one digit at a time — DuckDB's RE2 regex has no
    # backreferences, so the mirror can't write (.)\1+; keep both engines
    # on the identical construction
    collapsed = F.concat(flc, rc)
    for d in "01234567":
        collapsed = F.regexp_replace(collapsed, f"{d}+", d)
    digits = F.replace(F.substring(collapsed, 2, _BIG), F.lit("0"), F.lit(""))
    code = F.concat(fl, F.rpad(F.substring(digits, 1, 3), 3, "0"))
    return F.when(col.isNull(), F.lit(None)).when(u == "", F.lit("")).otherwise(code)


def soundex_duckdb_sql(expr: str) -> str:
    """DuckDB SQL computing the identical code for an expression string."""
    u = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    fl = f"substring({u}, 1, 1)"
    flc = f"translate({fl}, '{_FROM}', '{_TO_FIRST}')"
    rc = f"translate(substring({u}, 2), '{_FROM}', '{_TO_REST}')"
    collapsed = f"{flc} || {rc}"
    for d in "01234567":
        collapsed = f"regexp_replace({collapsed}, '{d}+', '{d}', 'g')"
    digits = f"replace(substring({collapsed}, 2), '0', '')"
    code = f"{fl} || rpad(substring({digits}, 1, 3), 3, '0')"
    return (
        f"(CASE WHEN {expr} IS NULL THEN NULL WHEN {u} = '' THEN '' "
        f"ELSE {code} END)"
    )


def soundex_blocking_pairs(
    ltable: DataFrame,
    rtable: DataFrame,
    l_key_attr: str,
    r_key_attr: str,
    l_block_attr: str,
    r_block_attr: str,
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate pairs whose blocking attrs share a soundex code.

    One codegen'd projection per side + a hash equi-join on the 4-char
    code; rows with NULL/empty codes never pair. ``max_block_size`` purges
    oversized blocks (the Papadakis block-purging rule) — computed with one
    aggregate on the smaller of the two sides' code frequencies joined
    semi-style, bounding the worst-case output at
    ``max_block_size²`` pairs per code.

    Self-join: pass the same table twice and filter
    ``l_<key> < r_<key>`` on the result.
    """
    l = ltable.select(
        F.col(l_key_attr).alias(f"l_{l_key_attr}"),
        soundex_column(F.col(l_block_attr)).alias("_sdx"),
    ).where(F.col("_sdx").isNotNull() & (F.col("_sdx") != ""))
    r = rtable.select(
        F.col(r_key_attr).alias(f"r_{r_key_attr}"),
        soundex_column(F.col(r_block_attr)).alias("_sdx"),
    ).where(F.col("_sdx").isNotNull() & (F.col("_sdx") != ""))
    if max_block_size is not None:
        keep = (
            l.groupBy("_sdx").agg(F.count(F.lit(1)).alias("_n_l"))
            .join(
                r.groupBy("_sdx").agg(F.count(F.lit(1)).alias("_n_r")), "_sdx"
            )
            .where(
                (F.col("_n_l") <= max_block_size)
                & (F.col("_n_r") <= max_block_size)
            )
            .select("_sdx")
        )
        l = l.join(F.broadcast(keep), "_sdx")
    return l.join(r, "_sdx").drop("_sdx")
