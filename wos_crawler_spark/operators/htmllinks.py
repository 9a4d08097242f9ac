"""Outlink extraction from the ``html:binary`` column of the pages
table — the operator that closes the crawl loop from storage alone:
fetch (J3) → **extract ``<a href>`` outlinks** → resolve against the
page URL → frontier expansion (SURVEY.md §2.3 J3 / F8), with no
pre-built ``links`` table required.

The reference never parses HTML links (WoS export pagination is
arithmetic, SURVEY.md S5); a Common-Crawl-style frontier (north_rule)
discovers its frontier FROM the fetched pages, so this is the missing
source of the expansion join's right side. ``links_from_pages(pages)``
is a drop-in for the synthetic ``links`` table accepted by
``plans.crawl.run_crawl``.

Engine-parity regex discipline (same rules as the PII redactor):
pure Catalyst ``regexp_extract_all`` over the decoded payload, with
patterns written in the Java∩RE2 common dialect so a DuckDB oracle can
re-run them byte-identically —

- no ``\\s`` (Java's ASCII ``\\s`` includes ``\\x0B``, RE2's does
  not): explicit ``[ \\t\\r\\n]`` classes;
- no ``(?i)`` (RE2 applies Unicode simple folding — U+212A KELVIN SIGN
  matches ``k`` — Java's default is ASCII-only): explicit
  ``[Hh][Rr][Ee][Ff]`` classes;
- no lookaround (RE2 has none).

Contract (pinned, documented subset of HTML/RFC 3986):

1. hrefs are recognized in three quoting styles (``"v"``, ``'v'``,
   unquoted) inside an ``<a``/``<A`` tag; attribute scanning is
   lazy-first-match within the tag, so a decoy ``href=`` inside an
   EARLIER attribute's value wins (real extractors tokenize
   attributes; this one is a scan, and says so).
2. leading/trailing ASCII whitespace and the ``#fragment`` are
   stripped from the href; an href that becomes empty (fragment-only
   self-links) is dropped.
3. absolute hrefs keep their spelling iff the scheme is http/https
   (case-insensitive); every other scheme (mailto:, javascript:,
   data:, ftp:) is dropped.
4. ``//host/p`` inherits the base scheme; ``/p`` inherits
   scheme://authority; anything else is resolved against the base
   directory (base path up to its last ``/``).
5. dot-segments (``/./``, ``/../``) are PRESERVED verbatim — RFC 3986
   §5.2.4 removal needs lookaround or iteration that the RE2 oracle
   dialect cannot express; downstream canonicalization (F2) is
   spelling-based, so preserved spellings stay deterministic.

Invalid UTF-8 payloads: the payload is read via ``cast(string)`` +
``make_valid_utf8`` — invalid sequences become U+FFFD deterministically
and the scan never throws (Spark 4's ANSI ``decode`` raises
MALFORMED_CHARACTER_CODING instead, so it is deliberately not used);
binary payloads should still be gated out first with
``operators.sniff.is_binary_payload``, which is byte-faithful in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wos_crawler_spark.functions.urlnorm import (
    _HOSTPORT_RE,
    _PATH_RE,
    _SCHEME_RE,
)

#: explicit ASCII whitespace — the Java∩RE2-identical stand-in for \s
#: (Java \s adds \x0B, RE2 \s does not; the intersection is this set,
#: \f included — FF is legal HTML5 inter-attribute whitespace).
_WS = " \\t\\r\\n\\f"
_A_OPEN = f"<[Aa][{_WS}]"
_HREF_EQ = f"[Hh][Rr][Ee][Ff][{_WS}]*=[{_WS}]*"

#: one pattern per quoting style; group 1 = the raw href value.
HREF_PATTERNS: dict[str, str] = {
    "dq": f'{_A_OPEN}[^>]*?{_HREF_EQ}"([^"]*)"',
    "sq": f"{_A_OPEN}[^>]*?{_HREF_EQ}'([^']*)'",
    "uq": f"{_A_OPEN}[^>]*?{_HREF_EQ}([^\"'{_WS}>][^{_WS}>]*)",
}

#: whole-anchor segment (group 0): open tag with an href + the text up
#: to the next tag — the with-anchors variant re-extracts per segment.
_ANCHOR_SEG = (
    f"{_A_OPEN}[^>]*?{_HREF_EQ}"
    f"(\"[^\"]*\"|'[^']*'|[^\"'{_WS}>][^{_WS}>]*)"
    f"[^>]*>[^<]*"
)


def html_hrefs(html: Column) -> Column:
    """``array<string>`` of raw href values in the decoded payload —
    one ``regexp_extract_all`` per quoting style, concatenated. Pure
    codegen'd exprs; the payload never leaves the scan."""
    h = F.make_valid_utf8(html.cast("string"))
    return F.concat(
        *(F.regexp_extract_all(h, F.lit(p), 1) for p in HREF_PATTERNS.values())
    )


def _strip_href(href: Column) -> Column:
    """Browser-style cleanup: trim ASCII whitespace, drop fragment.
    The fragment strip is (?s)-dotall — a quoted href may span lines
    ('<a href="/x#frag\\ntail">'), and without dotall '#.*' cannot
    cross the newline, leaking the fragment into dst_url; (?s) means
    the same thing in Java and RE2."""
    trimmed = F.regexp_replace(href, f"^[{_WS}]+|[{_WS}]+$", "")
    return F.regexp_replace(trimmed, "(?s)#.*", "")


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve one href against the page URL per the module contract;
    NULL = dropped (empty/fragment-only, or non-http(s) scheme)."""
    r = _strip_href(href)
    scheme = F.regexp_extract(r, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    base_scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    base_auth = F.regexp_extract(base, _HOSTPORT_RE, 1)  # verbatim
    base_path = F.regexp_extract(base, _PATH_RE, 1)
    base_dir = F.regexp_replace(
        F.when(base_path == "", F.lit("/")).otherwise(base_path),
        "[^/]*$",
        "",
    )
    null = F.lit(None).cast("string")
    return (
        F.when(r == "", null)
        .when(
            scheme != "",
            F.when(F.lower(scheme).isin("http", "https"), r).otherwise(null),
        )
        .when(r.startswith("//"), F.concat(base_scheme, F.lit(":"), r))
        .when(
            r.startswith("/"),
            F.concat(base_scheme, F.lit("://"), base_auth, r),
        )
        .otherwise(F.concat(base_scheme, F.lit("://"), base_auth, base_dir, r))
    )


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(src_url, href_raw, dst_url)`` — one row per recognized
    anchor href, resolved to an absolute http(s) URL. NULL/anchor-free
    html emits nothing (``explode``, not ``explode_outer``)."""
    exploded = df.select(
        F.col(url_col).alias("src_url"),
        F.explode(html_hrefs(F.col(html_col))).alias("href_raw"),
    )
    return exploded.withColumn(
        "dst_url", resolve_href(F.col("src_url"), F.col("href_raw"))
    ).filter(F.col("dst_url").isNotNull())


def links_from_pages(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``links(src_url, dst_url)`` distinct — the drop-in for
    ``run_crawl(..., links=...)`` / ``prepare_links_side``. dst_url is
    resolved but NOT canonicalized: the crawl plan canonicalizes at
    frontier-admission time (F2), exactly as it does for a stored
    links table, so derived and stored links flow identically."""
    return (
        extract_links(pages, url_col, html_col)
        .select("src_url", "dst_url")
        .distinct()
    )


def extract_links_with_anchors(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(src_url, href_raw, dst_url, anchor_text)`` — anchor text is
    the run up to the next tag boundary (``[^<]*``), a training-data
    signal (anchor-text corpora). Per-segment re-extraction uses
    ``F.transform`` over the per-row anchors array — interpreted, but
    the array is tiny (outlinks per page), so the scan stays
    payload-bound; the href-only path above is the pure-codegen one."""
    h = F.make_valid_utf8(F.col(html_col).cast("string"))
    segs = F.regexp_extract_all(h, F.lit(_ANCHOR_SEG), 0)

    def _href_of(seg: Column) -> Column:
        dq = F.regexp_extract(seg, HREF_PATTERNS["dq"], 1)
        sq = F.regexp_extract(seg, HREF_PATTERNS["sq"], 1)
        uq = F.regexp_extract(seg, HREF_PATTERNS["uq"], 1)
        # regexp_extract returns '' on no-match; first non-empty wins
        return F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)

    pairs = F.transform(
        segs,
        lambda s: F.struct(
            _href_of(s).alias("href_raw"),
            F.regexp_extract(s, ">([^<]*)$", 1).alias("anchor_text"),
        ),
    )
    exploded = df.select(
        F.col(url_col).alias("src_url"), F.explode(pairs).alias("a")
    ).select("src_url", "a.href_raw", "a.anchor_text")
    return exploded.withColumn(
        "dst_url", resolve_href(F.col("src_url"), F.col("href_raw"))
    ).filter(F.col("dst_url").isNotNull()).select(
        "src_url", "href_raw", "dst_url", "anchor_text"
    )


def anchor_text_corpus(
    links: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    anchor_col: str = "anchor_text",
    max_anchors: int = 64,
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-graph
    document signal (how the REST of the web describes a page; search
    engines index it, LLM pipelines mine it as query-like text):
    ``(dst_url, n_refs, n_src_hosts, anchors)`` where ``n_src_hosts``
    counts distinct REFERRING HOSTS (the spam-resistant popularity
    signal — a million anchors from one SEO farm is one host) and
    ``anchors`` is the sorted-distinct, whitespace-normalized,
    non-empty anchor texts joined by ``" | "``, capped at
    ``max_anchors`` lexicographically.

    Scale shape: normalization is map-side; the aggregation is one
    exchange keyed by dst_url. The hub hazard (a homepage linked from
    10^8 pages) is capped BEFORE the list aggregation — distinct
    (dst, anchor) rows first, then a row_number window keeps at most
    ``max_anchors`` per dst, so the final ``collect_list`` can never
    materialize more than the cap in one task. The whitespace class is
    the Java∩RE2 explicit set (no ``\\s``), so a DuckDB oracle
    re-runs normalization byte-identically."""
    if max_anchors < 1:
        raise ValueError("max_anchors must be >= 1")
    from pyspark.sql import Window

    from wos_crawler_spark.functions.urlnorm import url_host

    a_norm = F.trim(
        F.regexp_replace(F.col(anchor_col), "[ \\t\\r\\n\\f]+", " ")
    )
    base = links.select(
        F.col(dst_col).alias("dst_url"),
        url_host(F.col(src_col)).alias("_h"),
        a_norm.alias("_a"),
    )
    counts = base.groupBy("dst_url").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("_h").alias("n_src_hosts"),
    )
    da = (
        base.filter(F.col("_a").isNotNull() & (F.col("_a") != ""))
        .select("dst_url", "_a")
        .distinct()
    )
    w = Window.partitionBy("dst_url").orderBy("_a")
    capped = da.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_anchors
    )
    ag = capped.groupBy("dst_url").agg(
        F.array_join(F.array_sort(F.collect_list("_a")), " | ").alias(
            "anchors"
        )
    )
    return counts.join(ag, "dst_url", "left").withColumn(
        "anchors", F.coalesce(F.col("anchors"), F.lit(""))
    )
