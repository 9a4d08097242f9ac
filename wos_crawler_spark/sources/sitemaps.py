"""Sitemap XML source — the seed-discovery leg between robots.txt and
the frontier. ``operators/robots.parse_robots_sitemaps`` extracts the
``Sitemap:`` URLs a host advertises (RFC 9309 §2.3); THIS module turns
the fetched sitemap documents themselves into frontier seeds:

    <urlset>        one <url> block per page: loc + optional lastmod /
                    changefreq / priority  (sitemaps.org 0.9)
    <sitemapindex>  one <sitemap> block per CHILD sitemap: loc +
                    optional lastmod — an index of shards, not pages

Reference behavior (SURVEY §2.1 S1 family): the reference crawler's
seed list is a hand-written query file; a web crawler bootstraps from
sitemaps, and the lastmod channel feeds the recrawl scheduler
(``plans/recrawl.change_rate_schedule``) with the site's OWN change
claims before any fetch history exists.

Spark-first shape: the sitemaps.org spec caps one file at 50k URLs /
50 MB uncompressed and shards everything larger behind a sitemapindex
— so FILE-level parallelism is the spec's own sharding, and a
per-(sitemap_url, body) row is the natural unit. Parsing is ONE
codegen'd projection: sitemap XML is machine-generated with a fixed
element vocabulary, so ``regexp_extract_all`` over ``<url>`` /
``<sitemap>`` blocks + per-block child extraction covers it without a
per-row XML parser (the engine's XML-parser path,
``operators/parse_xml``, exists for the record-export format where
structure is genuinely recursive; sitemap blocks are flat by spec).
Malformed or truncated XML degrades to zero/partial rows — a regex
that does not match yields an empty array, never a task kill.

Entity handling: the spec requires entity-escaped URLs; the five XML
named entities are unescaped (``&amp;`` LAST, so ``&amp;lt;`` decodes
to the literal ``&lt;`` exactly once — the classic double-unescape
bug). Numeric character references are out of scope (documented; real
sitemap generators emit named entities for URL metacharacters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (?s) so blocks spanning pretty-printed lines match; non-greedy so
#: adjacent blocks do not merge; \b[^>]* tolerates attributes.
_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"


def xml_unescape(c: Column) -> Column:
    """The five XML named entities, ``&amp;`` last (order is the
    correctness: unescaping ``&amp;`` first would turn ``&amp;lt;``
    into ``&lt;`` and then into ``<`` — two decodes for one escape).
    Pure ``replace`` chain — literal, codegen'd, no regex engine."""
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&apos;"), F.lit("'"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def xml_escape(c: Column) -> Column:
    """Serializer twin of :func:`xml_unescape` — ``&`` FIRST (the
    mirror of unescape's ``&amp;`` last)."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&apos;"))


def _child(block: Column, tag: str) -> Column:
    """``<tag>value</tag>`` inside one block → trimmed value, NULL when
    absent (regexp_extract yields '' on no match; blank ≡ absent here —
    a loc/lastmod that is genuinely empty carries no information)."""
    v = F.trim(
        F.regexp_extract(block, rf"(?s)<{tag}\b[^>]*>(.*?)</{tag}>", 1)
    )
    return F.when(v != "", v)


def parse_sitemap_xml(
    pages: DataFrame,
    url_col: str = "sitemap_url",
    body_col: str = "body",
) -> DataFrame:
    """``(sitemap_url, body)`` fetched sitemap documents → one row per
    ``<url>`` / ``<sitemap>`` block:

    - ``sitemap_url``  the document the entry came from,
    - ``kind``         ``'urlset'`` (page entry) or ``'index'`` (child
                       sitemap entry),
    - ``loc``          entity-unescaped target URL (NULL → block had no
                       usable <loc>; callers filter),
    - ``lastmod``      W3C datetime → timestamp (bare dates and full
                       ISO-8601 with offset both parse; junk → NULL via
                       try_to_timestamp),
    - ``lastmod_raw``  the verbatim string (oracle/diagnostic channel —
                       timestamp semantics stay auditable),
    - ``changefreq``   lowercased claim (urlset only by spec),
    - ``priority``     double in [0,1], NULL on junk (try_cast).

    A document containing BOTH a <sitemapindex> and a <urlset> (spec
    violation) yields both kinds — admission is the caller's policy.
    One projection + one explode per kind, unioned; both sides prune
    the scan to (url, body)."""
    src = pages.select(
        F.col(url_col).alias("sitemap_url"), F.col(body_col).alias("_b")
    )

    def one_kind(kind: str, block_re: str) -> DataFrame:
        blocks = F.regexp_extract_all(F.col("_b"), F.lit(block_re), F.lit(1))
        b = F.col("_blk")
        pr = _child(b, "priority").try_cast("double")
        return (
            src.select(
                "sitemap_url", F.explode(blocks).alias("_blk")
            ).select(
                "sitemap_url",
                F.lit(kind).alias("kind"),
                xml_unescape(_child(b, "loc")).alias("loc"),
                F.try_to_timestamp(_child(b, "lastmod")).alias("lastmod"),
                _child(b, "lastmod").alias("lastmod_raw"),
                F.lower(_child(b, "changefreq")).alias("changefreq"),
                F.when((pr >= 0.0) & (pr <= 1.0), pr).alias("priority"),
            )
        )

    return one_kind("urlset", _URL_BLOCK).unionByName(
        one_kind("index", _SITEMAP_BLOCK)
    )


def sitemap_frontier_seeds(entries: DataFrame) -> DataFrame:
    """Parsed entries → frontier seed rows ``(url, lastmod, priority)``:
    urlset entries only, one row per url keeping the LATEST lastmod
    claim (a url listed by several sitemap shards — or by a stale and a
    fresh shard — must seed once, with the freshest claim; NULL lastmod
    loses to any dated claim). Priority rides along from the winning
    entry; ties on lastmod break on (priority desc, sitemap_url) so the
    survivor is partitioning-independent. One url-keyed exchange —
    everything before it is a map-side filter the scan pushes."""
    from pyspark.sql.window import Window

    f = entries.filter(
        (F.col("kind") == "urlset") & F.col("loc").isNotNull()
    )
    w = Window.partitionBy("loc").orderBy(
        F.col("lastmod").desc_nulls_last(),
        F.col("priority").desc_nulls_last(),
        F.col("sitemap_url").asc(),
    )
    return (
        f.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("loc").alias("url"), "lastmod", "priority", "changefreq"
        )
    )


def sitemap_stale_candidates(
    seeds: DataFrame,
    stored: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Sitemap-driven CONDITIONAL recrawl — the If-Modified-Since of
    the sitemap protocol: compare each seed's freshest ``lastmod``
    claim (from :func:`sitemap_frontier_seeds`) against the stored
    page's fetch timestamp and emit only the urls worth fetching:

    - ``status='new'``   — url not in the store at all;
    - ``status='stale'`` — stored, and the sitemap claims a strictly
      newer modification than our stored ``ts_col``.

    Urls with no ``lastmod`` claim that are already stored are
    DROPPED (no claim, no refetch — the conservative reading; the
    change-rate scheduler owns their cadence instead), as are
    fresh/unchanged urls. One url-keyed join; at production scale the
    stored side arrives bucketed by url (the prepare_fetch_side /
    Iceberg ``bucket(url)`` layout), so only the seed side shuffles.
    """
    st = stored.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("_stored_ts")
    )
    j = seeds.join(st, "url", "left")
    status = F.when(F.col("_stored_ts").isNull(), F.lit("new")).when(
        F.col("lastmod") > F.col("_stored_ts"), F.lit("stale")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "url", "status", "lastmod",
            F.col("_stored_ts").alias("stored_ts"), "priority",
        )
    )


def sitemap_children(entries: DataFrame) -> DataFrame:
    """Index entries → distinct child sitemap URLs still to fetch.
    Recursion is the crawl loop's job (fetch these, re-parse, repeat —
    one level per wave, exactly how nested sitemapindex files are
    meant to be walked); this just dedups the fetch list."""
    return (
        entries.filter((F.col("kind") == "index") & F.col("loc").isNotNull())
        .select(F.col("loc").alias("sitemap_url"))
        .distinct()
    )


def serialize_urlset(
    entries: DataFrame,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
    changefreq_col: str = "changefreq",
    priority_col: str = "priority",
    group_col: str = "sitemap_url",
) -> DataFrame:
    """Fixture builder: rows → one ``(sitemap_url, body)`` urlset XML
    document per ``group_col`` value. Blocks are sorted by loc inside
    the document so the serialization is deterministic under any input
    partitioning; optional fields are omitted when NULL (exercising the
    parser's absent-child path). lastmod renders as ISO-8601 UTC with
    explicit offset — the round trip cancels the session timezone by
    construction."""
    opt = (
        lambda tag, v: F.when(
            v.isNotNull(), F.concat(F.lit(f"<{tag}>"), v, F.lit(f"</{tag}>"))
        ).otherwise(F.lit(""))
    )
    block = F.concat(
        F.lit("<url><loc>"),
        xml_escape(F.col(loc_col)),
        F.lit("</loc>"),
        opt(
            "lastmod",
            F.date_format(
                F.to_utc_timestamp(
                    F.col(lastmod_col),
                    F.current_timezone(),
                ),
                "yyyy-MM-dd'T'HH:mm:ss'+00:00'",
            ),
        ),
        opt("changefreq", F.col(changefreq_col)),
        opt("priority", F.format_number(F.col(priority_col), 1)),
        F.lit("</url>"),
    )
    return (
        entries.select(F.col(group_col).alias("sitemap_url"), block.alias("_blk"))
        .groupBy("sitemap_url")
        .agg(
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="UTF-8"?>\n<urlset '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                ),
                F.array_join(F.array_sort(F.collect_list("_blk")), "\n"),
                F.lit("\n</urlset>"),
            ).alias("body")
        )
    )


def serialize_sitemapindex(
    children: DataFrame,
    loc_col: str = "sitemap_url",
    index_url: str = "https://example.com/sitemap.xml",
) -> DataFrame:
    """Fixture builder: child sitemap URLs → one ``(sitemap_url, body)``
    sitemapindex document (deterministic loc order)."""
    block = F.concat(
        F.lit("<sitemap><loc>"),
        xml_escape(F.col(loc_col)),
        F.lit("</loc></sitemap>"),
    )
    return children.select(block.alias("_blk")).agg(
        F.concat(
            F.lit(
                '<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex '
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            ),
            F.array_join(F.array_sort(F.collect_list("_blk")), "\n"),
            F.lit("\n</sitemapindex>"),
        ).alias("body")
    ).select(F.lit(index_url).alias("sitemap_url"), "body")
