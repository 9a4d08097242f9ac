"""Outlink extraction from html:binary (operators/htmllinks.py):
contract unit cases, junk handling, fixture equivalence
(links_from_pages ≡ links_table), and full-crawl parity — a crawl fed
links DERIVED from the pages' own html must fetch exactly what a crawl
fed the stored links table fetches."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.fixtures.synth import (
    linked_pages_table,
    links_table,
    pages_table,
    robots_table,
    seeds_table,
)
from wos_crawler_spark.operators.htmllinks import (
    extract_links,
    extract_links_with_anchors,
    links_from_pages,
)
from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl

BASE = "https://www.Example.com:8080/dir/sub/page.html?q=1"


def _links(spark, html: str, base: str = BASE):
    df = spark.createDataFrame(
        [(base, html.encode("utf-8"))], "url string, html binary"
    )
    return sorted(
        (r["href_raw"], r["dst_url"]) for r in extract_links(df).collect()
    )


@pytest.mark.parametrize(
    "html,expect",
    [
        # three quote styles
        ('<a href="https://x.org/a">t</a>', ["https://x.org/a"]),
        ("<a href='https://x.org/b'>t</a>", ["https://x.org/b"]),
        ("<a href=https://x.org/c>t</a>", ["https://x.org/c"]),
        # uppercase tag/attr, scheme case preserved (F2's job later)
        ('<A HREF="HTTP://X.org/D">t</A>', ["HTTP://X.org/D"]),
        # attribute soup before href; newline inside the tag
        ('<a class="z" \n href="https://x.org/e">t</a>', ["https://x.org/e"]),
        # protocol-relative inherits base scheme
        ('<a href="//cdn.x.org/f">t</a>', ["https://cdn.x.org/f"]),
        # root-relative inherits scheme://authority VERBATIM (port kept)
        ('<a href="/g">t</a>', ["https://www.Example.com:8080/g"]),
        # relative resolves against the base directory
        ('<a href="h.html">t</a>', ["https://www.Example.com:8080/dir/sub/h.html"]),
        # dot-segments preserved verbatim (documented non-collapse)
        ('<a href="../i">t</a>', ["https://www.Example.com:8080/dir/sub/../i"]),
        # whitespace + fragment stripped from the href
        ('<a href="  https://x.org/j#frag ">t</a>', ["https://x.org/j"]),
        # form feed is legal HTML5 inter-attribute whitespace
        ('<a\fhref="https://x.org/ff">t</a>', ["https://x.org/ff"]),
        # fragment strip crosses newlines inside a quoted href
        ('<a href="/x#frag\ntail">t</a>', ["https://www.Example.com:8080/x"]),
        # dropped: fragment-only, empty, non-http(s) schemes
        ('<a href="#top">t</a>', []),
        ('<a href="">t</a>', []),
        ('<a href="mailto:a@b.org">t</a>', []),
        ('<a href="javascript:void(0)">t</a>', []),
        ('<a href="ftp://x.org/z">t</a>', []),
        # href must live in an <a> tag with attribute space
        ('<link href="https://x.org/css">', []),
        ("no anchors at all", []),
    ],
)
def test_contract_cases(spark, html, expect):
    got = [dst for _, dst in _links(spark, html)]
    assert got == sorted(expect)


def test_multiple_anchors_one_page(spark):
    html = (
        '<p><a href="/a">1</a> mid <a href=\'/b\'>2</a>'
        "<a href=/c>3</a></p>"
    )
    got = [dst for _, dst in _links(spark, html)]
    assert got == [
        "https://www.Example.com:8080/a",
        "https://www.Example.com:8080/b",
        "https://www.Example.com:8080/c",
    ]


def test_base_without_path_resolves_from_root(spark):
    html = '<a href="x.html">t</a>'
    got = [dst for _, dst in _links(spark, html, base="https://h.org")]
    assert got == ["https://h.org/x.html"]


def test_invalid_utf8_and_null_html_never_throw(spark):
    df = spark.createDataFrame(
        [
            ("https://h.org/1", b'\xff\xfe garbage <a href="/ok">t</a>'),
            ("https://h.org/2", None),
        ],
        "url string, html binary",
    )
    rows = extract_links(df).collect()
    # JVM decode substitutes U+FFFD; the anchor after the garbage still
    # extracts; the NULL payload emits nothing
    assert [(r["src_url"], r["dst_url"]) for r in rows] == [
        ("https://h.org/1", "https://h.org/ok")
    ]


def test_anchor_text_variant(spark):
    html = (
        '<a href="/a">Alpha Link</a><a href=\'//x.org/b\'>B</a>'
        '<a href="#top">skip</a><a href=/c></a>'
    )
    df = spark.createDataFrame(
        [("https://h.org/", html.encode())], "url string, html binary"
    )
    rows = sorted(
        (r["dst_url"], r["anchor_text"])
        for r in extract_links_with_anchors(df).collect()
    )
    assert rows == [
        ("https://h.org/a", "Alpha Link"),
        ("https://h.org/c", ""),
        ("https://x.org/b", "B"),
    ]


N = 120


def test_links_from_pages_equals_links_table(spark):
    """The fixture theorem: anchors in linked_pages_table encode the
    links_table edges exactly, across every quote style / URL form."""
    derived = {
        (r["src_url"], r["dst_url"])
        for r in links_from_pages(linked_pages_table(spark, N)).collect()
    }
    stored = {
        (r["src_url"], r["dst_url"])
        for r in links_table(spark, N).distinct().collect()
    }
    assert derived == stored
    assert len(derived) > N  # two edges per page minus collisions


def test_crawl_parity_derived_vs_stored_links(spark):
    """End-to-end: run_crawl fed links_from_pages(html) produces the
    identical fetch log (wave, url, scheduled_ts) and seen set as the
    same crawl fed the stored links table — outlink discovery closes
    the loop with zero behavior change."""
    pages = pages_table(spark, N, partitions=4).cache()
    seeds, robots = seeds_table(spark), robots_table(spark)
    cfg = CrawlConfig(delay_s=1.0, parse=False, quota=5, max_waves=3,
                      max_depth=2, max_retries=2, rows_per_bucket=8)

    def log_of(result):
        rows = result.fetch_log.select("wave", "url", "scheduled_ts").collect()
        return sorted((r["wave"], r["url"], round(r["scheduled_ts"], 6)) for r in rows)

    stored = run_crawl(spark, pages, seeds, links_table(spark, N), robots, cfg)
    derived = run_crawl(
        spark, pages, seeds,
        links_from_pages(linked_pages_table(spark, N)), robots, cfg,
    )
    assert log_of(derived) == log_of(stored)
    seen_s = {r["url_hash"] for r in stored.seen.collect()}
    seen_d = {r["url_hash"] for r in derived.seen.collect()}
    assert seen_d == seen_s
    pages.unpersist()


# ------------------------------------------------------ anchor-text corpus


def test_anchor_text_corpus_aggregation(spark):
    from wos_crawler_spark.operators.htmllinks import anchor_text_corpus

    rows = [
        # hot dst D: 3 refs from 2 hosts; messy whitespace collapses,
        # duplicate normalized anchors dedup
        ("https://a.com/1", "https://d.org/p", "Click\t here "),
        ("https://a.com/2", "https://d.org/p", "Click here"),
        ("https://b.com/1", "https://d.org/p", "zebra link"),
        # dst E: anchors empty/NULL only -> anchors '' but refs counted
        ("https://a.com/1", "https://e.org/q", "   "),
        ("https://b.com/1", "https://e.org/q", None),
        # dst F: single ref, port stripped + host lowercased for
        # the distinct-host count
        ("https://A.COM:443/x", "https://f.org/r", "one"),
    ]
    df = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor_text string"
    )
    out = {r["dst_url"]: r for r in anchor_text_corpus(df).collect()}
    d = out["https://d.org/p"]
    assert d["n_refs"] == 3 and d["n_src_hosts"] == 2
    assert d["anchors"] == "Click here | zebra link"
    e = out["https://e.org/q"]
    assert e["n_refs"] == 2 and e["n_src_hosts"] == 2 and e["anchors"] == ""
    f = out["https://f.org/r"]
    assert f["n_refs"] == 1 and f["n_src_hosts"] == 1 and f["anchors"] == "one"


def test_anchor_text_corpus_cap_is_lexicographic_and_bounding(spark):
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.htmllinks import anchor_text_corpus

    df = spark.range(100).select(
        F.concat(F.lit("https://s"), (F.col("id") % 9).cast("string"),
                 F.lit(".com/p")).alias("src_url"),
        F.lit("https://hub.org/").alias("dst_url"),
        F.format_string("a%03d", F.col("id")).alias("anchor_text"),
    )
    out = anchor_text_corpus(df, max_anchors=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_refs"] == 100 and r["n_src_hosts"] == 9
    assert r["anchors"] == "a000 | a001 | a002 | a003 | a004"
    # partitioning invariance of the capped aggregate
    out2 = anchor_text_corpus(df.repartition(13), max_anchors=5).collect()
    assert out2[0]["anchors"] == r["anchors"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        anchor_text_corpus(df, max_anchors=0)
