"""URL canonicalization for crawl curation — pure Catalyst expressions.

Crawl dedup starts at the URL: the same page is fetched as
``HTTP://Example.COM:80/a/../b`` and ``http://example.com/b``, and a
frontier that can't canonicalize re-crawls and re-curates it. The
normalizations here are the RFC 3986 §6 set that is SAFE for any URL
(semantics-preserving by the spec itself):

- scheme and host lowercase (§6.2.2.1);
- default port elision (``:80`` http / ``:443`` https, §6.2.3);
- dot-segment resolution in the path (``.`` / ``..``, §5.2.4) — a
  Catalyst ``aggregate`` fold over the split segments (a JVM stack
  machine, no Python, no UDF);
- empty path → ``/`` for http(s) (§6.2.3);
- fragment removal (never sent to the server);
- query-parameter SORTING — NOT semantics-preserving in general
  (order can matter to applications) but the standard crawl-frontier
  tradeoff; off by default (``sort_query=True`` opts in).

Everything is a single narrow projection (whole-stage codegen):
normalization streams at scan speed and composes as the first stage
of a URL-keyed exact dedup.

``registered_domain`` groups hosts by their registrable domain with a
compact embedded subset of the Public Suffix List (the ~40 two-level
suffixes dominating web corpora + every pure ccTLD/gTLD as a
single-label suffix). It is deliberately a HEURISTIC: the full PSL is
9000+ rules and changes monthly; pipelines that need exactness ship
the real list as a broadcast join table — the column contract here is
identical, so swapping in the full list changes no downstream code.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["normalize_url", "registered_domain", "url_parts"]

# two-level public suffixes common in web corpora (subset; see module doc)
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "web.za",
    "co.kr", "or.kr", "go.kr",
    "com.tr", "org.tr", "gov.tr",
    "com.ar", "com.sg", "com.hk", "com.tw", "co.nz", "org.nz",
]


def _lower(c: Column) -> Column:
    return F.lower(c)


def url_parts(url: Column):
    """(scheme, host, port, path, query) columns from a URL column —
    `parse_url` built-ins plus a scheme regexp, all JVM-side."""
    scheme = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    host = F.parse_url(url, F.lit("HOST"))
    # parse_url HOST keeps the userinfo out but the port is separate
    port = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*?:(\d+)(?:[/?#]|$)", 1)
    path = F.parse_url(url, F.lit("PATH"))
    query = F.parse_url(url, F.lit("QUERY"))
    return scheme, host, port, path, query


def _resolve_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over split('/') via a Catalyst fold: '' and '.'
    segments vanish, '..' pops, a trailing '.'/'..' keeps the slash."""
    segs = F.split(path, "/")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == "..", F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))))
        .when((s == ".") | (s == ""), acc)
        .otherwise(F.concat(acc, F.array(s))),
    )
    joined = F.concat(F.lit("/"), F.array_join(stack, "/"))
    # a path ending in '/', '/.' or '/..' resolves to a directory — keep
    # the trailing slash (RFC: the output buffer ends with '/')
    trailing = path.rlike(r"(/|/\.|/\.\.)$") & (F.size(stack) > 0)
    return F.when(trailing, F.concat(joined, F.lit("/"))).otherwise(joined)


def normalize_url(url: Column, sort_query: bool = False) -> Column:
    """Canonical form of ``url`` (see module doc for the rule set).
    Non-absolute inputs (no ``scheme://``) come back unchanged —
    normalizing a relative reference without its base is wrong by
    definition."""
    scheme, host, port, path, query = url_parts(url)
    lscheme = _lower(scheme)
    default = ((lscheme == "http") & (port == "80")) | (
        (lscheme == "https") & (port == "443")
    )
    port_part = F.when(default | (port == ""), F.lit("")).otherwise(F.concat(F.lit(":"), port))
    npath = F.when(
        path.isNull() | (path == ""), F.lit("/")
    ).otherwise(_resolve_dot_segments(path))
    if sort_query:
        q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    else:
        q = query
    q_part = F.when(query.isNull() | (query == ""), F.lit("")).otherwise(F.concat(F.lit("?"), q))
    # userinfo is part of the fetch identity (RFC 3986 §3.2.1) — re-emit
    # it verbatim (case-SENSITIVE, never lowercased) instead of silently
    # merging http://user:pw@h/x with http://h/x (ADVICE r13)
    userinfo = F.parse_url(url, F.lit("USERINFO"))
    ui_part = F.when(
        userinfo.isNull() | (userinfo == ""), F.lit("")
    ).otherwise(F.concat(userinfo, F.lit("@")))
    out = F.concat(lscheme, F.lit("://"), ui_part, _lower(host), port_part, npath, q_part)
    # a scheme without a parseable authority (mailto:, data:, broken
    # input) null-propagates through the concat — fall back to the
    # original rather than silently NULLing the column
    return F.when(scheme == "", url).otherwise(F.coalesce(out, url))


def registered_domain(host: Column) -> Column:
    """Registrable domain of a hostname (heuristic PSL subset — see
    module doc): ``blog.news.example.co.uk`` → ``example.co.uk``,
    ``a.b.example.com`` → ``example.com``. Single-label hosts
    (``localhost``) and IPv4 literals pass through unchanged."""
    h = _lower(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, F.lit(2)), ".")
    last3 = F.array_join(F.slice(labels, n - 2, F.lit(3)), ".")
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    two_level = last2.isin(_TWO_LEVEL_SUFFIXES)
    return (
        F.when(is_ip | (n <= 1), h)
        .when(two_level & (n >= 3), last3)
        .when(two_level, last2)  # the bare suffix itself
        .otherwise(last2)
    )


def with_normalized_url(
    df: DataFrame, url_col: str, out: str = "url_norm", domain_out: Optional[str] = "domain",
    sort_query: bool = False,
) -> DataFrame:
    """DataFrame convenience: append the canonical URL and (optionally)
    the registrable domain — one narrow projection."""
    res = df.withColumn(out, normalize_url(F.col(url_col), sort_query=sort_query))
    if domain_out:
        res = res.withColumn(domain_out, registered_domain(F.parse_url(F.col(out), F.lit("HOST"))))
    return res
