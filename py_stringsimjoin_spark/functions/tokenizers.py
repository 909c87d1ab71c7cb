"""Tokenizers: whitespace-delimiter and q-gram, as native Spark expressions.

Capability parity with the reference's external tokenizer dependency
(py_stringmatching DelimiterTokenizer / QgramTokenizer, used at
/root/reference/py_stringsimjoin/tests/test_join.py:179-182). Semantics:

* ``WhitespaceTokenizer`` splits on runs of whitespace, drops empty tokens
  (so a value of ``' '`` tokenizes to the empty list — the reference's
  "empty token set" corner case, SURVEY.md §1.2).
* ``QgramTokenizer(qval, padding)`` pads with ``#``/``$`` (q-1 copies) by
  default and emits the sliding q-character windows; ``return_set`` keeps
  set-vs-bag semantics (edit-distance joins require the bag form,
  /root/reference/py_stringsimjoin/utils/validation.py:87-98).

Each tokenizer exposes:
* ``spark_col(col)``  -> Column of array<string> (JVM-side, codegen'd — the
  hot path; no Python UDF involved)
* ``tokenize(s)``     -> list[str] single-string Python form (test oracles)
* ``duckdb_sql(expr)``-> SQL snippet producing the same token list in DuckDB
  (driver oracle parity)

NULL input -> NULL array (callers drop or route NULLs per allow_missing).
Empty string -> empty array (both tokenizers, incl. padded q-gram).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class Tokenizer:
    return_set: bool

    def spark_col(self, col: Column) -> Column:  # pragma: no cover - interface
        raise NotImplementedError

    def tokenize(self, s: str | None) -> list[str] | None:
        raise NotImplementedError

    def duckdb_sql(self, expr: str) -> str:
        raise NotImplementedError

    def _maybe_set(self, arr: Column) -> Column:
        return F.array_distinct(arr) if self.return_set else arr

    def _maybe_set_py(self, toks: list[str]) -> list[str]:
        if not self.return_set:
            return toks
        return list(dict.fromkeys(toks))  # order-preserving distinct


class WhitespaceTokenizer(Tokenizer):
    """Split on runs of whitespace; drop empty tokens."""

    def __init__(self, return_set: bool = True):
        self.return_set = return_set

    def spark_col(self, col: Column) -> Column:
        toks = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")
        return F.when(col.isNull(), F.lit(None)).otherwise(self._maybe_set(toks))

    def tokenize(self, s: str | None) -> list[str] | None:
        if s is None:
            return None
        return self._maybe_set_py(s.split())

    def duckdb_sql(self, expr: str) -> str:
        toks = f"list_filter(string_split_regex(trim({expr}), '\\s+'), t -> t <> '')"
        if self.return_set:
            toks = f"list_distinct({toks})"
        return f"CASE WHEN {expr} IS NULL THEN NULL ELSE {toks} END"

    def __repr__(self):
        return f"WhitespaceTokenizer(return_set={self.return_set})"


def _escape_regex_char(ch: str) -> str:
    """Escape one literal character identically for Java regex (Spark), RE2
    (DuckDB) and Python ``re``: only genuinely special punctuation is
    escaped — never letters/digits, where a backslash could form a class
    escape (\\d) in one engine but not another."""
    return "\\" + ch if ch in "\\.^$|?*+()[]{}" else ch


class DelimiterTokenizer(Tokenizer):
    """Split on any of an arbitrary set of literal delimiter strings.

    Capability parity with py_stringmatching's ``DelimiterTokenizer`` as the
    reference consumes it (/root/reference/py_stringsimjoin/tests/
    test_join.py:179-182, benchmarks/custom_benchmarks/benchmark_join.py:
    25-30): the string is segmented at every occurrence of any delimiter
    (multi-character delimiters allowed) and empty tokens are dropped.
    Delimiters are matched longest-first so overlapping delimiters (e.g.
    ``", "`` and ``","``) behave identically in all three engines
    (leftmost-first alternation in Java regex, RE2 and Python ``re``).
    """

    def __init__(self, delim_set=(" ",), return_set: bool = False):
        delims = sorted(set(delim_set), key=lambda d: (-len(d), d))
        if not delims or any(d == "" for d in delims):
            raise ValueError("delim_set must contain non-empty strings")
        self.delim_set = delims
        self.return_set = return_set
        self._pattern = "|".join(
            "".join(_escape_regex_char(c) for c in d) for d in delims
        )
        import re

        self._re = re.compile(self._pattern)

    def spark_col(self, col: Column) -> Column:
        toks = F.filter(F.split(col, self._pattern, -1), lambda t: t != "")
        return F.when(col.isNull(), F.lit(None)).otherwise(self._maybe_set(toks))

    def tokenize(self, s: str | None) -> list[str] | None:
        if s is None:
            return None
        return self._maybe_set_py([t for t in self._re.split(s) if t != ""])

    def duckdb_sql(self, expr: str) -> str:
        pat = self._pattern.replace("'", "''")
        toks = f"list_filter(string_split_regex({expr}, '{pat}'), t -> t <> '')"
        if self.return_set:
            toks = f"list_distinct({toks})"
        return f"CASE WHEN {expr} IS NULL THEN NULL ELSE {toks} END"

    def __repr__(self):
        return (
            f"DelimiterTokenizer(delim_set={self.delim_set}, "
            f"return_set={self.return_set})"
        )


class AlphanumericTokenizer(Tokenizer):
    """Maximal runs of ASCII alphanumeric characters as tokens.

    Capability parity with py_stringmatching's ``AlphanumericTokenizer``
    (the reference accepts any py_stringmatching tokenizer for the set-sim
    joins, /root/reference/py_stringsimjoin/utils/validation.py:73-84); the
    upstream tokenizer is defined by the ASCII regex ``[a-zA-Z0-9]+``, so
    non-ASCII letters act as separators. Implemented as split-on-complement
    + drop-empties, which is regex-findall semantics expressed identically
    in Java regex (Spark), RE2 (DuckDB) and Python ``re``.
    """

    _keep = "a-zA-Z0-9"

    def __init__(self, return_set: bool = False):
        self.return_set = return_set
        import re

        self._re = re.compile(f"[^{self._keep}]+")

    def spark_col(self, col: Column) -> Column:
        toks = F.filter(F.split(col, f"[^{self._keep}]+", -1), lambda t: t != "")
        return F.when(col.isNull(), F.lit(None)).otherwise(self._maybe_set(toks))

    def tokenize(self, s: str | None) -> list[str] | None:
        if s is None:
            return None
        return self._maybe_set_py([t for t in self._re.split(s) if t != ""])

    def duckdb_sql(self, expr: str) -> str:
        toks = (
            f"list_filter(string_split_regex({expr}, '[^{self._keep}]+'), "
            "t -> t <> '')"
        )
        if self.return_set:
            toks = f"list_distinct({toks})"
        return f"CASE WHEN {expr} IS NULL THEN NULL ELSE {toks} END"

    def __repr__(self):
        return f"{type(self).__name__}(return_set={self.return_set})"


class AlphabeticTokenizer(AlphanumericTokenizer):
    """Maximal runs of ASCII alphabetic characters (py_stringmatching
    ``AlphabeticTokenizer``, regex ``[a-zA-Z]+``); digits act as separators.
    """

    _keep = "a-zA-Z"


class QgramTokenizer(Tokenizer):
    """Character q-grams with optional #/$ padding (q-1 pad chars each side)."""

    def __init__(
        self,
        qval: int = 2,
        padding: bool = True,
        prefix_pad: str = "#",
        suffix_pad: str = "$",
        return_set: bool = False,
    ):
        if qval < 1:
            raise ValueError("qval must be >= 1")
        if len(prefix_pad) != 1 or len(suffix_pad) != 1:
            raise ValueError("pad chars must be single characters")
        self.qval = qval
        self.padding = padding
        self.prefix_pad = prefix_pad
        self.suffix_pad = suffix_pad
        self.return_set = return_set

    def _pad_py(self, s: str) -> str:
        if not self.padding:
            return s
        k = self.qval - 1
        return self.prefix_pad * k + s + self.suffix_pad * k

    def spark_col(self, col: Column) -> Column:
        q = self.qval
        if self.padding:
            k = q - 1
            padded = F.concat(
                F.lit(self.prefix_pad * k), col, F.lit(self.suffix_pad * k)
            )
        else:
            padded = col
        n_windows = F.length(padded) - q + 1
        toks = F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.substring(padded, i, q),
        )
        empty = F.array().cast("array<string>")
        out = F.when(F.length(col) == 0, empty).otherwise(
            F.when(n_windows < 1, empty).otherwise(self._maybe_set(toks))
        )
        return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(out)

    def tokenize(self, s: str | None) -> list[str] | None:
        if s is None:
            return None
        if len(s) == 0:
            return []
        p = self._pad_py(s)
        if len(p) < self.qval:
            return []
        toks = [p[i : i + self.qval] for i in range(len(p) - self.qval + 1)]
        return self._maybe_set_py(toks)

    def duckdb_sql(self, expr: str) -> str:
        q = self.qval
        k = q - 1
        if self.padding:
            padded = f"(repeat('{self.prefix_pad}', {k}) || {expr} || repeat('{self.suffix_pad}', {k}))"
        else:
            padded = f"({expr})"
        toks = (
            f"list_transform(range(1, length({padded}) - {q} + 2), "
            f"i -> substr({padded}, i::INT, {q}))"
        )
        if self.return_set:
            toks = f"list_distinct({toks})"
        return (
            f"CASE WHEN {expr} IS NULL THEN NULL "
            f"WHEN length({expr}) = 0 OR length({padded}) < {q} THEN [] "
            f"ELSE {toks} END"
        )

    def __repr__(self):
        return (
            f"QgramTokenizer(qval={self.qval}, padding={self.padding}, "
            f"return_set={self.return_set})"
        )


class ShingleTokenizer(Tokenizer):
    """Word n-gram shingles ("a b c", n=2 -> ["a b", "b c"]) — the dedup
    workhorse (MinHash / n-gram-Jaccard near-dup detection). Not in the
    reference (it stops at unigram/q-gram tokens); added for the web-scale
    dedup suite."""

    def __init__(self, n: int = 3, return_set: bool = True):
        if n < 1:
            raise ValueError("n must be >= 1")
        self.n = n
        self.return_set = return_set
        self._ws = WhitespaceTokenizer(return_set=False)

    def spark_col(self, col: Column) -> Column:
        words = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")
        n = self.n
        shingles = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - n + 1, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
        empty = F.array().cast("array<string>")
        out = F.when(F.size(words) < n, empty).otherwise(self._maybe_set(shingles))
        return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(out)

    def tokenize(self, s: str | None) -> list[str] | None:
        if s is None:
            return None
        words = s.split()
        if len(words) < self.n:
            return []
        toks = [" ".join(words[i : i + self.n]) for i in range(len(words) - self.n + 1)]
        return self._maybe_set_py(toks)

    def duckdb_sql(self, expr: str) -> str:
        words = f"list_filter(string_split_regex(trim({expr}), '\\s+'), t -> t <> '')"
        toks = (
            f"list_transform(range(1, greatest(length({words}) - {self.n} + 2, 1)), "
            f"i -> array_to_string(list_slice({words}, i, i + {self.n} - 1), ' '))"
        )
        if self.return_set:
            toks = f"list_distinct({toks})"
        return (
            f"CASE WHEN {expr} IS NULL THEN NULL "
            f"WHEN length({words}) < {self.n} THEN [] ELSE {toks} END"
        )

    def __repr__(self):
        return f"ShingleTokenizer(n={self.n}, return_set={self.return_set})"
