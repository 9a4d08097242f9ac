"""Sitemap XML source (sources/sitemaps.py): block/field extraction,
entity-escape round trip (incl. the double-unescape trap), W3C
datetime parsing, latest-lastmod seed dedup, sitemapindex children,
malformed-document degradation, robots.txt tie-in."""

from pyspark.sql import functions as F

from wos_crawler_spark.operators.robots import parse_robots_sitemaps
from wos_crawler_spark.sources.sitemaps import (
    parse_sitemap_xml,
    serialize_sitemapindex,
    serialize_urlset,
    sitemap_children,
    sitemap_frontier_seeds,
    xml_unescape,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://ex.com/a?x=1&amp;y=2</loc><lastmod>2024-01-02</lastmod><changefreq>Daily</changefreq><priority>0.8</priority></url>
<url>
  <loc> https://ex.com/b </loc>
  <lastmod>2024-03-04T05:06:07+00:00</lastmod>
</url>
<url><lastmod>2024-01-01</lastmod></url>
<url><loc></loc></url>
<url><loc>https://ex.com/p</loc><priority>7.5</priority><lastmod>not a date</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>https://ex.com/s1.xml</loc></sitemap>
<sitemap><loc>https://ex.com/s2.xml</loc><lastmod>junk</lastmod></sitemap>
<sitemap><loc>https://ex.com/s1.xml</loc></sitemap>
</sitemapindex>"""


def _pages(spark):
    return spark.createDataFrame(
        [
            ("https://ex.com/sitemap.xml", URLSET),
            ("https://ex.com/idx.xml", INDEX),
            ("https://ex.com/garbage.xml", "<<<this is not xml at all"),
            ("https://ex.com/empty.xml", None),
        ],
        "sitemap_url string, body string",
    )


def test_parse_fields_and_degradation(spark):
    rows = parse_sitemap_xml(_pages(spark)).collect()
    by_loc = {r["loc"]: r for r in rows if r["kind"] == "urlset"}
    a = by_loc["https://ex.com/a?x=1&y=2"]  # entity-unescaped
    assert a["changefreq"] == "daily"  # lowercased claim
    assert abs(a["priority"] - 0.8) < 1e-9
    assert a["lastmod"] is not None and a["lastmod_raw"] == "2024-01-02"
    b = by_loc["https://ex.com/b"]  # whitespace-trimmed, full ISO parses
    assert b["lastmod"].second == 7
    p = by_loc["https://ex.com/p"]
    assert p["priority"] is None  # out of [0,1] → NULL
    assert p["lastmod"] is None and p["lastmod_raw"] == "not a date"
    # blocks with missing/empty loc survive with NULL loc (no task kill)
    assert None in by_loc
    # garbage / NULL bodies yield zero rows, never an error
    assert all(
        r["sitemap_url"] not in
        ("https://ex.com/garbage.xml", "https://ex.com/empty.xml")
        for r in rows
    )


def test_seeds_latest_lastmod_wins(spark):
    shard = (
        '<urlset><url><loc>https://ex.com/a</loc>'
        "<lastmod>2025-06-01</lastmod></url>"
        "<url><loc>https://ex.com/c</loc></url></urlset>"
    )
    pages = _pages(spark).unionByName(
        spark.createDataFrame(
            [("https://ex.com/shard2.xml", shard)],
            "sitemap_url string, body string",
        )
    )
    seeds = {
        r["url"]: r for r in
        sitemap_frontier_seeds(parse_sitemap_xml(pages)).collect()
    }
    # /a listed in two shards: note loc differs (query) — the dated
    # duplicate here is the bare /a from shard2 only; /c has NULL
    # lastmod and still seeds (one row, claim unknown)
    assert seeds["https://ex.com/a"]["lastmod"].year == 2025
    assert seeds["https://ex.com/c"]["lastmod"] is None
    # NULL-loc blocks never seed
    assert None not in seeds
    dup = (
        '<urlset><url><loc>https://ex.com/b</loc>'
        "<lastmod>2020-01-01</lastmod><priority>0.9</priority></url></urlset>"
    )
    pages2 = pages.unionByName(
        spark.createDataFrame(
            [("https://ex.com/old.xml", dup)],
            "sitemap_url string, body string",
        )
    )
    seeds2 = {
        r["url"]: r for r in
        sitemap_frontier_seeds(parse_sitemap_xml(pages2)).collect()
    }
    # stale 2020 claim loses to the 2024 one; winner's priority rides
    b = seeds2["https://ex.com/b"]
    assert b["lastmod"].year == 2024 and b["priority"] is None


def test_index_children_and_mixed_document(spark):
    kids = sorted(
        r["sitemap_url"]
        for r in sitemap_children(parse_sitemap_xml(_pages(spark))).collect()
    )
    assert kids == ["https://ex.com/s1.xml", "https://ex.com/s2.xml"]
    # a spec-violating document carrying both kinds yields both
    both = "<sitemapindex><sitemap><loc>x.xml</loc></sitemap></sitemapindex>" \
        "<urlset><url><loc>https://y</loc></url></urlset>"
    rows = parse_sitemap_xml(
        spark.createDataFrame(
            [("https://ex.com/both.xml", both)],
            "sitemap_url string, body string",
        )
    ).collect()
    assert {r["kind"] for r in rows} == {"index", "urlset"}


def test_double_unescape_trap(spark):
    # &amp;lt; must decode to the literal text "&lt;" — exactly once
    df = spark.range(1).select(
        xml_unescape(F.lit("a&amp;lt;b&amp;amp;c")).alias("v")
    )
    assert df.first()["v"] == "a&lt;b&amp;c"


def test_roundtrip_serialize_parse(spark):
    rows = spark.createDataFrame(
        [
            ("https://ex.com/s1.xml", 'https://ex.com/a?x=1&y=<2>"q\'',
             "2024-01-02 03:04:05", "daily", 0.8),
            ("https://ex.com/s1.xml", "https://ex.com/b", None, None, None),
            ("https://ex.com/s2.xml", 'https://ex.com/a?x=1&y=<2>"q\'',
             "2024-02-02 03:04:05", None, 0.5),
        ],
        "sitemap_url string, loc string, lastmod_s string, "
        "changefreq string, priority double",
    ).withColumn("lastmod", F.col("lastmod_s").cast("timestamp"))
    docs = serialize_urlset(rows)
    assert docs.count() == 2
    back = parse_sitemap_xml(docs)
    got = {
        (r["sitemap_url"], r["loc"], str(r["lastmod"]), r["changefreq"],
         r["priority"])
        for r in back.collect()
    }
    want = {
        (r["sitemap_url"], r["loc"], str(r["lastmod"]), r["changefreq"],
         r["priority"])
        for r in rows.select(
            "sitemap_url", "loc", "lastmod", "changefreq", "priority"
        ).collect()
    }
    assert got == want
    # index round trip
    idx = serialize_sitemapindex(
        spark.createDataFrame(
            [("https://ex.com/s1.xml",), ("https://ex.com/s2.xml",)],
            "sitemap_url string",
        ),
        index_url="https://ex.com/root.xml",
    )
    kids = sorted(
        r["sitemap_url"]
        for r in sitemap_children(parse_sitemap_xml(idx)).collect()
    )
    assert kids == ["https://ex.com/s1.xml", "https://ex.com/s2.xml"]


def test_robots_tie_in(spark):
    """The discovery chain: robots.txt Sitemap: directives → fetch →
    parse → seeds. The chain's joints are shape-compatible by
    construction."""
    robots = spark.createDataFrame(
        [("ex.com",
          "User-agent: *\nDisallow: /tmp\nSitemap: https://ex.com/sitemap.xml\n")],
        "host string, body string",
    )
    advertised = parse_robots_sitemaps(robots)
    assert advertised.collect()[0]["sitemap_url"] == "https://ex.com/sitemap.xml"
    fetched = advertised.join(
        _pages(spark), "sitemap_url"
    )  # stand-in for the fetch join
    seeds = sitemap_frontier_seeds(parse_sitemap_xml(fetched))
    assert seeds.count() == 3


def test_stale_candidates(spark):
    """Conditional-recrawl semantics: new / stale / unchanged /
    no-claim rows route correctly; no-claim stored urls are dropped."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.sources.sitemaps import sitemap_stale_candidates

    seeds = spark.createDataFrame(
        [
            ("https://a/1", "2024-01-10", 0.5),   # stored older -> stale
            ("https://a/2", "2024-01-10", None),  # stored same   -> drop
            ("https://a/3", "2024-01-10", None),  # stored newer  -> drop
            ("https://a/4", None, 0.9),           # stored, no claim -> drop
            ("https://a/5", "2024-01-10", None),  # not stored    -> new
            ("https://a/6", None, None),          # not stored, no claim -> new
        ],
        "url string, lm string, priority double",
    ).select("url", F.to_timestamp("lm").alias("lastmod"), "priority")
    stored = spark.createDataFrame(
        [
            ("https://a/1", "2024-01-05"),
            ("https://a/2", "2024-01-10"),
            ("https://a/3", "2024-01-20"),
            ("https://a/4", "2024-01-05"),
        ],
        "url string, ts string",
    ).select("url", F.to_timestamp("ts").alias("warc_ts"))
    got = {
        r.url: r.status
        for r in sitemap_stale_candidates(seeds, stored).collect()
    }
    assert got == {
        "https://a/1": "stale",
        "https://a/5": "new",
        "https://a/6": "new",
    }
