"""Full Public-Suffix-List registrable-domain path (round 5):
wildcard (`*.ck`) and exception (`!www.ck`) rule semantics, parity
with the literal-subset expression on wildcard-free rule sets, the
~9k-rule fixture at scale, and full-crawl fetch-order parity with the
simulator in PSL-keyed politeness_domain mode."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.blocklist import (
    DEFAULT_PUBLIC_SUFFIXES,
    psl_parse_rules,
    registrable_domain,
    registrable_domain_psl,
    registrable_domain_python,
    synth_psl_rules,
)

HOSTS = [
    "a.b.example.com",
    "www.example.co.uk",
    "deep.blog.shop.example.co.uk",
    "u9.github.io",
    "weird.host.zz",
    "co.uk",
    "com",
    "single",
    "a.b.c.d.e.example.org",
]


def test_psl_parity_with_literal_subset(spark):
    """On a wildcard-free rule set the PSL path and the literal-array
    expression are the same algorithm — identical output, NULLs
    included."""
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    both = df.select(
        "host",
        registrable_domain(F.col("host")).alias("expr_rd"),
        registrable_domain_psl(
            F.col("host"), DEFAULT_PUBLIC_SUFFIXES
        ).alias("psl_rd"),
    ).collect()
    for r in both:
        assert r["expr_rd"] == r["psl_rd"], r["host"]


def test_psl_wildcard_and_exception_semantics():
    parsed = psl_parse_rules(["ck", "*.ck", "!www.ck", "// comment", ""])
    rd = lambda h: registrable_domain_python(h, parsed)
    # wildcard: *.ck makes every X.ck a public suffix
    assert rd("a.b.ck") == "a.b.ck"
    assert rd("b.ck") is None           # b.ck IS a public suffix
    # exception: !www.ck carves www.ck back out → suffix is ck
    assert rd("www.ck") == "www.ck"
    assert rd("foo.www.ck") == "www.ck"
    # exact rule still applies below the wildcard
    assert rd("ck") is None
    assert rd(None) is None


def test_psl_case_folding_and_implicit_rule():
    parsed = psl_parse_rules(["com"])
    assert registrable_domain_python("A.B.Example.COM", parsed) == "example.com"
    # no rule matches → implicit * (last label is the suffix)
    assert registrable_domain_python("x.unknowntld", parsed) == "x.unknowntld"
    assert registrable_domain_python("unknowntld", parsed) is None


def test_psl_9k_rules_at_scale(spark):
    """The real PSL's size/shape: ~9k rules over 50k hosts through
    the Arrow path, spot-verified against the python twin."""
    rules = synth_psl_rules()
    assert len(rules) > 9000
    parsed = psl_parse_rules(rules)
    hosts = spark.range(50_000).select(
        F.concat(
            F.lit("sub"), (F.col("id") % 7).cast("string"), F.lit("."),
            F.lit("s"), (F.col("id") % 9000).cast("string"),
            F.lit(".zz"), (F.col("id") % 97).cast("string"),
        ).alias("host")
    )
    out = hosts.withColumn(
        "rd", registrable_domain_psl(F.col("host"), rules)
    )
    sample = out.limit(500).collect()
    assert len(sample) == 500
    for r in sample:
        assert r["rd"] == registrable_domain_python(r["host"], parsed)
    # the generated exact rules actually matched (suffix = s<i>.zz<j>,
    # so rd keeps exactly three labels)
    assert all(r["rd"].count(".") == 2 for r in sample)


def test_full_crawl_parity_psl_mode(spark):
    """politeness_domain with cfg.psl_rules: the PSL-keyed scheduling
    unit flows through quota, token bucket, stats — fetch-order and
    seen-set parity vs the simulator whose domain_map comes from the
    shared python match function. A *.example.org wildcard makes
    every hN.example.org farm host its OWN unit, so PSL mode really
    diverges from the literal-subset collapse (non-vacuity)."""
    from wos_crawler_spark.fixtures import wosgen
    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.functions.urlnorm import with_url_canon
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from wos_crawler_spark.plans.simulator import simulate_crawl

    n = 150
    rules = tuple(DEFAULT_PUBLIC_SUFFIXES) + ("*.example.org",)
    parsed = psl_parse_rules(rules)
    cfg_common = dict(
        quota=4, max_waves=3, max_depth=3, max_retries=2, rows_per_bucket=8
    )
    pages = pages_table(spark, n, partitions=4)
    links = links_table(spark, n)
    eng = run_crawl(
        spark, pages, seeds_table(spark), links, robots_table(spark),
        CrawlConfig(
            delay_s=1.0, parse=False, politeness_domain=True,
            psl_rules=rules, **cfg_common,
        ),
    )
    urls = [wosgen.url_of(i) for i in range(n)] + [
        r["dst_url"] for r in links.select("dst_url").distinct().collect()
    ]
    meta_rows = with_url_canon(
        spark.createDataFrame([(u,) for u in set(urls)], "url string")
    ).collect()
    url_meta = {
        r["url"]: (r["url_canon"], r["url_hash"], r["host"])
        for r in meta_rows
    }
    dmap = {
        h: (registrable_domain_python(h, parsed) or h)
        for h in {m[2] for m in url_meta.values()}
    }
    page_texts = {
        r["url"]: r["text"] for r in pages.select("url", "text").collect()
    }
    links_map = {}
    for r in links.collect():
        links_map.setdefault(r["src_url"], []).append(r["dst_url"])
    robots_map = {}
    for r in robots_table(spark).collect():
        robots_map.setdefault(r["host"], []).append(
            (r["rule_prefix"], r["allow"], r["rule_len"])
        )
    seed_list = [
        (r["query_id"], r["term"], r["priority"])
        for r in seeds_table(spark).collect()
    ]
    sim_kwargs = dict(
        pages_urls=set(page_texts), page_texts=page_texts, seeds=seed_list,
        links=links_map, robots=robots_map, url_meta=url_meta, delay_s=1.0,
        **cfg_common,
    )
    sim = simulate_crawl(
        politeness_domain=True, domain_map=dmap, **sim_kwargs
    )
    rows = eng.fetch_log.select(
        "wave", "url", "scheduled_ts", "host", "url_hash"
    ).collect()
    rows.sort(
        key=lambda r: (r["wave"], r["scheduled_ts"], r["host"], r["url_hash"])
    )
    engine_order = [
        (r["wave"], r["url"], round(r["scheduled_ts"], 6)) for r in rows
    ]
    assert len(engine_order) > 10
    assert engine_order == sim.fetch_order
    assert {r["url_hash"] for r in eng.seen.collect()} == sim.seen
    # non-vacuity: the wildcard un-collapses the farm vs subset mode
    from wos_crawler_spark.operators.blocklist import (
        psl_parse_rules as _ppr,
    )

    subset_map = {
        h: (
            registrable_domain_python(h, _ppr(DEFAULT_PUBLIC_SUFFIXES))
            or h
        )
        for h in dmap
    }
    assert subset_map != dmap
    subset_sim = simulate_crawl(
        politeness_domain=True, domain_map=subset_map, **sim_kwargs
    )
    assert subset_sim.fetch_order != sim.fetch_order
