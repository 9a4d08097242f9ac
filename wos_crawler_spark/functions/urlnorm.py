"""URL canonicalization + hashing (SURVEY.md F2).

Reference behavior: Scrapy fingerprints requests over a canonicalized
URL (``dep:w3lib.url::canonicalize_url`` — lowercase scheme/host, strip
fragment, sort query params); the fingerprint feeds the in-memory seen
set (``dep:scrapy.dupefilters::RFPDupeFilter.request_seen``).

Here the canonicalization is a **pure Catalyst expression composition**
(whole-stage-codegen'd, JVM-side, no Python) and the fingerprint is
``xxhash64`` of the canonical string. A bit-identical pure-Python twin
(`canonicalize_url_py`) backs the single-threaded determinism oracle in
tests.

Canonical form (pinned contract):
  1. strip ``#fragment``
  2. lowercase scheme and host (path/query case preserved)
  3. drop default ports (``:80`` for http, ``:443`` for https) — a
     port is ONLY the trailing ``:digits`` of the authority; any other
     authority content (IPv6 brackets, multi-colon junk, non-numeric
     "ports") is kept VERBATIM (lowercased), so distinct malformed
     URLs never collapse to one fingerprint
  4. empty path -> ``/``
  5. query params sorted bytewise on the raw ``k=v`` strings,
     re-joined with ``&``; empty query dropped entirely
  6. scheme-less inputs degenerate deterministically to
     ``://`` + ``/`` (+ sorted query) — the crawler only emits
     absolute URLs; the twin just has to agree

Catalyst and the Python twin are byte-identical over arbitrary
strings (hypothesis-fuzzed in tests/test_urlnorm.py), not just over
well-formed URLs — one dirty link in a real corpus must not make the
engine and the determinism oracle disagree about the seen set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([^:/?#]+)://"
_HOSTPORT_RE = r"^[^:/?#]+://([^/?#]*)"
_PATH_RE = r"^[^:/?#]+://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased host (trailing ``:digits`` port stripped) — the
    politeness/robots key. Non-port authority junk stays verbatim."""
    url = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_replace(hostport, r":\d+$", "")


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a Catalyst expression tree (no UDF)."""
    url = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment

    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    # a port is ONLY a trailing :digits run; default ports drop, any
    # other shape (IPv6, multi-colon, non-numeric) passes through
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    hostpart = F.when(
        is_default, F.regexp_replace(hostport, r":\d+$", "")
    ).otherwise(hostport)

    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.regexp_extract(u, _QUERY_RE, 1)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )

    return F.concat(scheme, F.lit("://"), hostpart, path, query_part)


def with_url_canon(df, url_col: str = "url"):
    """Attach ``url_canon``, ``url_hash`` (xxhash64), ``host`` columns."""
    canon = canonicalize_url(url_col)
    return (
        df.withColumn("url_canon", canon)
        .withColumn("url_hash", F.xxhash64(F.col("url_canon")))
        .withColumn("host", url_host(F.col("url_canon")))
    )


_PORT_RE_PY = __import__("re").compile(r":(\d+)$")


def canonicalize_url_py(url: str) -> str:
    """Pure-Python twin of :func:`canonicalize_url` — byte-identical
    over ARBITRARY strings (hypothesis-fuzzed in tests/test_urlnorm.py),
    including malformed authorities and scheme-less inputs. Used by
    the single-threaded crawl simulator oracle (SURVEY.md §4)."""
    u = url.split("#", 1)[0]
    scheme = ""
    idx = u.find("://")
    has_scheme = idx > 0 and all(c not in u[:idx] for c in ":/?#")
    if has_scheme:
        scheme = u[:idx].lower()
        rest = u[idx + 3 :]
        # hostport = up to first / ? #
        end = len(rest)
        for c in "/?#":
            p = rest.find(c)
            if p != -1:
                end = min(end, p)
        hostport = rest[:end].lower()
        tail = rest[end:]
        m = _PORT_RE_PY.search(hostport)
        if m:
            port = m.group(1)
            if (scheme == "http" and port == "80") or (
                scheme == "https" and port == "443"
            ):
                hostport = hostport[: m.start()]
        qpos = tail.find("?")
        path = tail if qpos == -1 else tail[:qpos]
        query = "" if qpos == -1 else tail[qpos + 1 :]
    else:
        # degenerate scheme-less form: empty authority, '/' path, any
        # query after the FIRST '?' — mirrors the Catalyst regexes
        hostport = ""
        path = ""
        qpos = u.find("?")
        query = "" if qpos == -1 else u[qpos + 1 :]
    if path == "":
        path = "/"
    qpart = ""
    if query != "":
        # sort like Spark's array_sort on strings: UTF-16 code-unit
        # order (Java String.compareTo), not Python code-point order
        parts = sorted(query.split("&"), key=lambda s: s.encode("utf-16-be"))
        qpart = "?" + "&".join(parts)
    return f"{scheme}://{hostport}{path}{qpart}"
