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
  3. drop default ports (``:80`` for http, ``:443`` for https)
  4. empty path -> ``/``
  5. query params sorted bytewise on the raw ``k=v`` strings,
     re-joined with ``&``; empty query dropped entirely
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([^:/?#]+)://"
_HOSTPORT_RE = r"^[^:/?#]+://([^/?#]*)"
_PATH_RE = r"^[^:/?#]+://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased host (port stripped) — the politeness/robots key."""
    url = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_extract(hostport, r"^([^:]*)", 1)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a Catalyst expression tree (no UDF)."""
    url = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment

    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.regexp_extract(u, _QUERY_RE, 1)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )

    return F.concat(scheme, F.lit("://"), host, port, path, query_part)


def with_url_canon(df, url_col: str = "url"):
    """Attach ``url_canon``, ``url_hash`` (xxhash64), ``host`` columns."""
    canon = canonicalize_url(url_col)
    return (
        df.withColumn("url_canon", canon)
        .withColumn("url_hash", F.xxhash64(F.col("url_canon")))
        .withColumn("host", url_host(F.col("url_canon")))
    )


def canonicalize_url_py(url: str) -> str:
    """Pure-Python twin of :func:`canonicalize_url` — must stay
    byte-identical (property-tested in tests/test_urlnorm.py). Used by
    the single-threaded crawl simulator oracle (SURVEY.md §4)."""
    u = url.split("#", 1)[0]
    # scheme
    rest = u
    scheme = ""
    idx = u.find("://")
    if idx > 0 and all(c not in u[:idx] for c in ":/?#"):
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
    if ":" in hostport:
        host, _, port = hostport.rpartition(":")
        if port.isdigit():
            if (scheme == "http" and port == "80") or (
                scheme == "https" and port == "443"
            ):
                hostport = host
    # path / query
    qpos = tail.find("?")
    path = tail if qpos == -1 else tail[:qpos]
    query = "" if qpos == -1 else tail[qpos + 1 :]
    if path == "":
        path = "/"
    qpart = ""
    if query != "":
        qpart = "?" + "&".join(sorted(query.split("&")))
    return f"{scheme}://{hostport}{path}{qpart}"
