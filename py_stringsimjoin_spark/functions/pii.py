"""PII detection and redaction for web-text corpora, in triple form.

A Common-Crawl-style corpus headed for model training gets scrubbed of
personally identifiable information as a standard hygiene pass (the public
Dolma / ROOTS / C4 pipelines all ship regex-based email / phone / IP
scrubbers). The reference engine (anhaidgroup/py_stringsimjoin) has no
text-hygiene surface at all — it joins opaque strings — so this module is
net-new capability layered on the same corpus the join operators consume.

Like functions/urls.py and functions/tokenizers.py, every class exists in
three bit-identical forms so the driver's DuckDB oracle can replay it:

* ``redact_pii_expr(col)``   -> Spark Column (chained ``regexp_replace`` —
  pure JVM, codegen-friendly, no UDF anywhere)
* ``redact_pii(s)``          -> single-string Python form (test oracle)
* ``redact_pii_sql(expr)``   -> DuckDB SQL snippet with the same output
* ``pii_count_*``            -> per-class match counts in the same three
  forms (Spark ``regexp_count`` / Python ``finditer`` / DuckDB
  ``len(regexp_extract_all(..))``)

Pattern-portability rules (shared Java-regex / RE2 / Python ``re`` subset,
same as functions/urls.py): no lookaround, no backreferences, leftmost-first
alternation, ``[0-9]``/``[A-Za-z]`` instead of ``\\d``/``\\w`` (Python's
``\\d`` is Unicode, Java's and RE2's are ASCII), and ``\\b`` only where
every neighbouring literal is ASCII (the three engines' ``\\b`` agree on
ASCII word characters; Python's differs only adjacent to non-ASCII letters,
which none of these all-ASCII token classes can touch).

Detected classes (deliberately conservative, spec'd not heuristic — a
redactor must be deterministic and cheap at 10^12 documents, not clever):

* ``email``        ``local@domain.tld`` with the usual local charset
* ``ipv6``         full 8-group form only (compressed ``::`` forms need
  stateful validation the shared regex subset can't express)
* ``ipv4``         dotted quad of 1-3 digit octets; values above 255 are
  accepted (loose on purpose — redaction favours recall, documented)
* ``credit_card``  4 groups of 4 digits joined by a space or dash
* ``ssn``          ``3-2-4`` digits (US Social Security shape)
* ``phone``        separator-required 10-digit forms with optional ``+CC``
  or ``(area)``; a bare unseparated digit run is NOT a phone (precision:
  ids / timestamps would drown the corpus in false hits)

Application order is fixed: email → ipv6 → ipv4 → credit_card → ssn →
phone, so a class never matches inside an earlier class's replacement
token (tokens contain no digits or ``@``).

Scale shape: every form is a scalar expression chain on one column — no
shuffle, no UDF, fully inside whole-stage codegen; a redaction pass over a
100 TB corpus is a map-only job that pushes column pruning into the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- patterns
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV6 = r"\b([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"
_IPV4 = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
_CREDIT_CARD = r"\b[0-9]{4}([ -][0-9]{4}){3}\b"
_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
# three leftmost-first alternatives: +CC form (starts at '+', no \b needed —
# '+' is a non-word char), parenthesised area code (starts at '(', same),
# and the bare separated form (digit-initial, so it needs the boundary).
_PHONE = (
    r"\+[0-9]{1,3}[ .-]?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-][0-9]{4}\b"
    r"|\([0-9]{3}\) ?[0-9]{3}[ .-][0-9]{4}\b"
    r"|\b[0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}\b"
)

#: ordered (class name, pattern, replacement token). Order is part of the
#: spec — see module docstring.
PII_CLASSES: tuple[tuple[str, str, str], ...] = (
    ("email", _EMAIL, "<EMAIL>"),
    ("ipv6", _IPV6, "<IP6>"),
    ("ipv4", _IPV4, "<IP>"),
    ("credit_card", _CREDIT_CARD, "<CREDIT_CARD>"),
    ("ssn", _SSN, "<SSN>"),
    ("phone", _PHONE, "<PHONE>"),
)

_CLASS_ORDER = tuple(name for name, _, _ in PII_CLASSES)
_BY_NAME = {name: (pat, tok) for name, pat, tok in PII_CLASSES}


def _resolve(classes) -> list[tuple[str, str, str]]:
    if classes is None:
        return list(PII_CLASSES)
    unknown = set(classes) - set(_CLASS_ORDER)
    if unknown:
        raise AssertionError(
            f"unknown PII classes {sorted(unknown)}; known: {list(_CLASS_ORDER)}"
        )
    # always apply in canonical order regardless of the caller's order —
    # the order is part of the output spec.
    return [(n, *_BY_NAME[n]) for n in _CLASS_ORDER if n in set(classes)]


# ---------------------------------------------------------------- Spark form
def redact_pii_expr(col: Column, classes=None) -> Column:
    """Redacted text as a chained-``regexp_replace`` Spark Column.

    NULL in → NULL out. ``classes`` restricts to a subset of
    :data:`PII_CLASSES` names (application order stays canonical).
    """
    out = col
    for _, pat, tok in _resolve(classes):
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_count_expr(col: Column, cls: str) -> Column:
    """Number of ``cls`` matches in the ORIGINAL text (long; NULL for NULL).

    Counts are per-class over the raw text, independent of redaction order
    — overlapping classes (an ipv4 inside a phone-shaped run, say) each
    count their own matches.
    """
    pat, _ = _BY_NAME[cls]
    return F.regexp_count(col, F.lit(pat)).cast("long")


# --------------------------------------------------------------- Python form
_PY_RES = {name: re.compile(pat) for name, pat, _ in PII_CLASSES}


def redact_pii(s: str | None, classes=None) -> str | None:
    """Single-string Python mirror of :func:`redact_pii_expr`."""
    if s is None:
        return None
    for name, _, tok in _resolve(classes):
        s = _PY_RES[name].sub(tok, s)
    return s


def pii_counts(s: str | None, classes=None) -> dict[str, int] | None:
    """Per-class match counts; None for NULL input."""
    if s is None:
        return None
    return {
        name: sum(1 for _ in _PY_RES[name].finditer(s))
        for name, _, _ in _resolve(classes)
    }


# --------------------------------------------------------------- DuckDB form
def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def redact_pii_sql(expr: str, classes=None) -> str:
    """DuckDB SQL snippet computing the identical redaction ('g' flag —
    DuckDB replaces only the first match by default)."""
    out = expr
    for _, pat, tok in _resolve(classes):
        out = f"regexp_replace({out}, {_sql_quote(pat)}, '{tok}', 'g')"
    return out


def pii_count_sql(expr: str, cls: str) -> str:
    pat, _ = _BY_NAME[cls]
    return f"len(regexp_extract_all({expr}, {_sql_quote(pat)}))::BIGINT"
