"""URL canonicalization for web-page entity resolution, in triple form.

The deployment target (BASELINE.json north star) blocks and joins on "page
titles/URLs/extracted text" over Common-Crawl-style pages; the single
highest-yield blocking key for web pages is the CANONICAL URL — the same
document is recrawled under `http://` vs `https://`, with and without
`www.`, with tracking query parameters, fragments, default ports, and
trailing slashes. The reference engine has no URL handling (it joins opaque
strings); this module supplies it Spark-first.

Like the tokenizers (functions/tokenizers.py), every function exists in
three bit-identical forms so the driver's DuckDB oracle can replay it:

* ``*_expr(col)``   -> Spark Column (pure JVM expressions — regexp_extract /
  filter / array_sort; no UDF, codegen-friendly, safe in any join hot path)
* ``normalize_url(s)`` etc. -> single-string Python form (test oracles)
* ``*_sql(expr)``   -> DuckDB SQL snippet with the same output

Canonicalization spec (deterministic; all three engines agree exactly):

1. NULL -> NULL; input is trimmed.
2. A value with no ``scheme://`` prefix is returned trimmed but otherwise
   untouched (it is not a hierarchical URL; guessing a scheme would merge
   distinct keys).
3. scheme and host are ASCII-lowercased — ``translate(A-Z, a-z)``, never
   locale/Unicode ``lower()``: DNS case-insensitivity is ASCII-only
   (RFC 4343; IDN hosts travel as punycode-ASCII), and Unicode special
   casing diverges across engines (DuckDB lowers ``İ`` to ``i``,
   Python/Java to ``i̇``). The path/query are NOT touched (case is
   significant there per RFC 3986).
4. userinfo (``user:pass@``) is dropped; a leading ``www.`` is dropped;
   default ports (``:80`` for http, ``:443`` for https) are dropped, other
   ports kept.
5. the fragment (``#...``) is dropped.
6. query parameters matching the tracking set (``utm_*``, ``gclid``,
   ``fbclid``, ``msclkid``, ``igshid``, ``mc_cid``, ``mc_eid``, ``ref``,
   ``ref_src``) are dropped; the REMAINING parameters are sorted bytewise
   ascending and rejoined with ``&`` (parameter order never distinguishes
   resources in practice; sorting makes the key order-insensitive). An
   empty surviving query drops the ``?`` entirely.
7. trailing slashes on the path are stripped (``/a/b/`` == ``/a/b``; a
   bare root path becomes the empty path).

Out of scope (documented, deliberate): percent-encoding normalization, IDN
/ punycode, and scheme inference — each would need state or tables the
pure-expression form can't carry; at 10^12 pages the value of this key is
the cheap 95% case above.

``url_registrable_domain`` approximates the public-suffix list with the
common two-level suffixes (``co.uk``-style); the full PSL is a data file a
deployment can swap in — the expression shape (single anchored regex, no
join) stays the same.

Scale shape: everything here is a scalar expression on one column — no
shuffle, no UDF, fully pushed into whole-stage codegen. ``canonical_url
_groups`` (operators/dedup.py consumer pattern) groups on the 16-byte md5
of the canonical form, not the string, so the shuffle key is fixed-width.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- patterns
# Shared by Java regex (Spark), RE2 (DuckDB) and Python `re`: no
# backreferences, no lookaround, leftmost-first alternation only.
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"
_TRACKING_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|ref|ref_src)(=.*)?$"
_SUFFIX_RE = (
    r"([^.]+\.(?:co\.uk|org\.uk|ac\.uk|gov\.uk|co\.jp|ne\.jp|or\.jp"
    r"|com\.au|net\.au|org\.au|com\.br|co\.in|co\.kr|co\.nz|com\.mx"
    r"|com\.cn|com\.tw|com\.sg|[^.]+))$"
)


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_PY_LOWER = str.maketrans(_UPPER, _LOWER)


# ---------------------------------------------------------------- Spark form
def _hostport_expr(s: Column) -> Column:
    hp = F.translate(F.regexp_extract(s, _HOSTPORT_RE, 1), _UPPER, _LOWER)
    return F.regexp_replace(hp, r"^[^@]*@", "")


def url_host_expr(col: Column) -> Column:
    """Lowercased host of a ``scheme://`` URL, userinfo/port/``www.``
    stripped; '' for non-hierarchical values, NULL for NULL."""
    hp = _hostport_expr(F.trim(col))
    host = F.regexp_replace(hp, r":[0-9]*$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_registrable_domain_expr(col: Column) -> Column:
    """Registrable domain of the host (``a.b.example.co.uk`` ->
    ``example.co.uk``) via the embedded common-suffix set; a dotless host
    maps to itself."""
    host = url_host_expr(col)
    dom = F.regexp_extract(host, _SUFFIX_RE, 1)
    return F.when(dom == "", host).otherwise(dom)


def normalize_url_expr(col: Column) -> Column:
    """Canonical URL per the module spec — pure JVM expressions."""
    s = F.trim(col)
    scheme = F.translate(F.regexp_extract(s, _SCHEME_RE, 1), _UPPER, _LOWER)
    hp = _hostport_expr(s)
    host = F.regexp_replace(
        F.regexp_replace(hp, r":[0-9]*$", ""), r"^www\.", ""
    )
    port = F.regexp_extract(hp, r":([0-9]+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.regexp_replace(F.regexp_extract(s, _PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(s, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    qpart = F.when(qcanon == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qcanon)
    )
    canon = F.concat(scheme, F.lit("://"), host, portpart, path, qpart)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(scheme == "", s).otherwise(canon)
    )


# --------------------------------------------------------------- Python form
def normalize_url(s: str | None) -> str | None:
    """Single-string reference implementation (same spec, same output)."""
    if s is None:
        return None
    s = s.strip(" ")  # space-only: Spark/DuckDB trim() strips 0x20, not \t
    m = re.match(_SCHEME_RE, s)
    if not m:
        return s
    scheme = m.group(1).translate(_PY_LOWER)
    mhp = re.match(_HOSTPORT_RE, s)
    hp = re.sub(
        r"^[^@]*@", "", (mhp.group(1) if mhp else "").translate(_PY_LOWER)
    )
    host = re.sub(r"^www\.", "", re.sub(r":[0-9]*$", "", hp))
    mport = re.search(r":([0-9]+)$", hp)
    port = mport.group(1) if mport else ""
    if (scheme == "http" and port == "80") or (
        scheme == "https" and port == "443"
    ):
        port = ""
    portpart = f":{port}" if port else ""
    mpath = re.match(_PATH_RE, s)
    path = re.sub(r"/+$", "", mpath.group(1) if mpath else "")
    mq = re.match(_QUERY_RE, s)
    query = mq.group(1) if mq else ""
    params = sorted(
        p for p in query.split("&") if p and not re.match(_TRACKING_RE, p)
    )
    qpart = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{portpart}{path}{qpart}"


def url_host(s: str | None) -> str | None:
    if s is None:
        return None
    mhp = re.match(_HOSTPORT_RE, s.strip(" "))
    hp = re.sub(
        r"^[^@]*@", "", (mhp.group(1) if mhp else "").translate(_PY_LOWER)
    )
    return re.sub(r"^www\.", "", re.sub(r":[0-9]*$", "", hp))


def url_registrable_domain(s: str | None) -> str | None:
    if s is None:
        return None
    host = url_host(s)
    m = re.search(_SUFFIX_RE, host)
    return m.group(1) if m else host


# --------------------------------------------------------------- DuckDB form
def _sql_hostport(expr: str) -> str:
    return (
        f"regexp_replace(translate(regexp_extract({expr}, "
        f"'{_HOSTPORT_RE}', 1), '{_UPPER}', '{_LOWER}'), '^[^@]*@', '')"
    )


def url_host_sql(expr: str) -> str:
    hp = _sql_hostport(f"trim({expr})")
    return (
        f"regexp_replace(regexp_replace({hp}, ':[0-9]*$', ''), "
        f"'^www\\.', '')"
    )


def url_registrable_domain_sql(expr: str) -> str:
    host = url_host_sql(expr)
    return (
        f"(CASE WHEN regexp_extract({host}, '{_SUFFIX_RE}', 1) = '' "
        f"THEN {host} ELSE regexp_extract({host}, '{_SUFFIX_RE}', 1) END)"
    )


def normalize_url_sql(expr: str) -> str:
    """DuckDB snippet producing exactly ``normalize_url_expr``'s output.

    The regex literals are written with single backslashes: DuckDB default
    string literals pass backslashes through to RE2 verbatim.
    """
    s = f"trim({expr})"
    scheme = (
        f"translate(regexp_extract({s}, '{_SCHEME_RE}', 1), "
        f"'{_UPPER}', '{_LOWER}')"
    )
    hp = _sql_hostport(s)
    host = (
        f"regexp_replace(regexp_replace({hp}, ':[0-9]*$', ''), "
        f"'^www\\.', '')"
    )
    port = f"regexp_extract({hp}, ':([0-9]+)$', 1)"
    portpart = (
        f"(CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END)"
    )
    path = (
        f"regexp_replace(regexp_extract({s}, '{_PATH_RE}', 1), '/+$', '')"
    )
    query = f"regexp_extract({s}, '{_QUERY_RE}', 1)"
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))"
    )
    # list_sort([]) is NULL in DuckDB — coalesce keeps the empty-query case ''
    qcanon = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    qpart = f"(CASE WHEN {qcanon} = '' THEN '' ELSE '?' || {qcanon} END)"
    canon = f"({scheme} || '://' || {host} || {portpart} || {path} || {qpart})"
    return (
        f"(CASE WHEN {expr} IS NULL THEN NULL "
        f"WHEN {scheme} = '' THEN {s} ELSE {canon} END)"
    )
