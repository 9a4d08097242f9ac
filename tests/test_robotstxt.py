"""Raw robots.txt parsing (F3 front-end): RFC 9309 group semantics,
agent specificity, empty-Disallow, comments/CRLF, Crawl-delay, and the
Spark mapInPandas wrapper feeding robots_filter end-to-end."""

from wos_crawler_spark.operators.robots import (
    parse_robots_body,
    parse_robots_body_full,
)

BODY = (
    "# global defaults\r\n"
    "User-agent: *\r\n"
    "Disallow: /private/\r\n"
    "Allow: /private/ok\r\n"
    "Crawl-delay: 10\r\n"
    "\r\n"
    "User-agent: wcsbot\r\n"
    "User-agent: otherbot\r\n"
    "Disallow: /search\r\n"
    "\r\n"
    "User-agent: WCSBot  # case-insensitive\r\n"
    "Disallow: /api/\r\n"
    "Sitemap: https://x.org/sitemap.xml\r\n"
)


def test_star_group_when_no_token_match():
    rules = parse_robots_body(BODY, user_agent="randombot")
    assert sorted(rules) == [
        ("/private/", False, 9),
        ("/private/ok", True, 11),
    ]


def test_exact_token_beats_star_and_merges_same_specificity():
    rules = parse_robots_body(BODY, user_agent="wcsbot")
    # BOTH wcsbot groups merge (same winning specificity); the * group
    # is excluded entirely (RFC: most specific agent only)
    assert sorted(rules) == [
        ("/api/", False, 5),
        ("/search", False, 7),
    ]


def test_empty_disallow_is_no_rule():
    assert parse_robots_body("User-agent: *\nDisallow:\n") == []


def test_rules_before_any_agent_are_dropped():
    assert parse_robots_body("Disallow: /x\n") == []


def test_no_groups_no_rules():
    assert parse_robots_body("") == []
    assert parse_robots_body("Sitemap: https://a.b/s.xml\n") == []


def test_agent_line_after_rules_starts_new_group():
    body = (
        "User-agent: a\nDisallow: /one\n"
        "User-agent: b\nDisallow: /two\n"
    )
    assert parse_robots_body(body, "a") == [("/one", False, 4)]
    assert parse_robots_body(body, "b") == [("/two", False, 4)]


def test_crawl_delay_is_group_scoped():
    # delay lives in the * group only: randombot inherits it, wcsbot's
    # winning (exact-token) groups carry none
    assert parse_robots_body_full(BODY, "randombot")[1] == 10.0
    assert parse_robots_body_full(BODY, "wcsbot")[1] is None


def test_crawl_delay_max_merges_across_winning_groups():
    body = (
        "User-agent: bot\nCrawl-delay: 2.5\nDisallow: /a\n"
        "User-agent: bot\nCrawl-delay: 7\n"
    )
    rules, delay = parse_robots_body_full(body, "bot")
    assert delay == 7.0
    assert rules == [("/a", False, 2)]


def test_crawl_delay_invalid_values_ignored():
    assert parse_robots_body_full(
        "User-agent: *\nCrawl-delay: soon\n", "x"
    )[1] is None
    assert parse_robots_body_full(
        "User-agent: *\nCrawl-delay: -3\n", "x"
    )[1] is None
    # a later valid one in the same group still counts
    assert parse_robots_body_full(
        "User-agent: *\nCrawl-delay: nope\nCrawl-delay: 4\n", "x"
    )[1] == 4.0


def test_spark_host_delays_drive_the_token_bucket(spark):
    """parse_robots_delays → schedule_wave(host_delays=...): listed
    hosts run at their Crawl-delay, others at the default; the per-host
    inter-fetch gap invariant holds at each host's own rate."""
    from wos_crawler_spark.operators.politeness import schedule_wave
    from wos_crawler_spark.operators.robots import parse_robots_delays

    bodies = spark.createDataFrame(
        [
            ("slow.org", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n"),
            ("fast.org", "User-agent: *\nDisallow: /y\n"),  # no delay row
            ("bad.org", "User-agent: *\nCrawl-delay: zzz\n"),
        ],
        "host string, body string",
    )
    delays = parse_robots_delays(bodies)
    assert {tuple(r) for r in delays.collect()} == {("slow.org", 5.0)}

    frontier = spark.createDataFrame(
        [
            (h, i * 10 + k, 0, 0)
            for k, h in enumerate(["slow.org", "fast.org", "bad.org"])
            for i in range(4)
        ],
        "host string, url_hash long, priority int, discovered_wave int",
    )
    sched = schedule_wave(
        frontier, delay_s=1.0, wave_start=0.0, host_delays=delays
    ).select("host", "scheduled_ts")
    by_host = {}
    for r in sched.collect():
        by_host.setdefault(r["host"], []).append(r["scheduled_ts"])
    assert sorted(by_host["slow.org"]) == [0.0, 5.0, 10.0, 15.0]
    assert sorted(by_host["fast.org"]) == [0.0, 1.0, 2.0, 3.0]
    assert sorted(by_host["bad.org"]) == [0.0, 1.0, 2.0, 3.0]


def test_spark_wrapper_feeds_robots_filter(spark):
    """Raw bodies → rules table → broadcast LPM gate, end to end."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.robots import (
        parse_robots_pages,
        robots_filter,
    )

    bodies = spark.createDataFrame(
        [
            ("a.org", "User-agent: *\nDisallow: /no/\nAllow: /no/yes\n"),
            ("b.org", "User-agent: wcsbot\nDisallow: /\n"),
            ("c.org", None),  # no robots body → everything allowed
        ],
        "host string, body string",
    )
    rules = parse_robots_pages(bodies, user_agent="wcsbot")
    got = {
        (r["host"], r["rule_prefix"], r["allow"], r["rule_len"])
        for r in rules.collect()
    }
    assert got == {
        ("a.org", "/no/", False, 4),
        ("a.org", "/no/yes", True, 7),
        ("b.org", "/", False, 1),
    }

    frontier = spark.createDataFrame(
        [
            ("http://a.org/no/page", "a.org"),
            ("http://a.org/no/yes/page", "a.org"),
            ("http://a.org/fine", "a.org"),
            ("http://b.org/anything", "b.org"),
            ("http://c.org/x", "c.org"),
        ],
        "url_canon string, host string",
    )
    kept = {
        r["url_canon"] for r in robots_filter(frontier, rules).collect()
    }
    assert kept == {
        "http://a.org/no/yes/page",
        "http://a.org/fine",
        "http://c.org/x",
    }


def test_parse_robots_sitemaps(spark):
    from wos_crawler_spark.operators.robots import parse_robots_sitemaps

    body_a = (
        "User-agent: *\r\n"
        "Disallow: /private\r\n"
        "Sitemap: https://a.com/sitemap.xml  # trailing comment\r\n"
        "sitemap:https://a.com/news.xml\r\n"
        "SITEMAP:   https://a.com/sitemap.xml\r\n"   # dup after case/ws
        "NotADirective https://a.com/junk.xml\n"
    )
    pages = spark.createDataFrame(
        [("a.com", body_a), ("b.com", "User-agent: *\nDisallow: /"),
         ("c.com", None)],
        "host string, body string",
    )
    got = {
        (r.host, r.sitemap_url)
        for r in parse_robots_sitemaps(pages).collect()
    }
    assert got == {
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://a.com/news.xml"),
    }


def _rules_df(spark, rows):
    return spark.createDataFrame(
        [(h, p, a, len(p)) for h, p, a in rows],
        "host string, rule_prefix string, allow boolean, rule_len int",
    )


def _gate(spark, rules_rows, paths, wildcards=True):
    from wos_crawler_spark.operators.robots import robots_filter

    rules = _rules_df(spark, rules_rows)
    frontier = spark.createDataFrame(
        [(f"https://w.org{p}", "w.org") for p in paths],
        "url_canon string, host string",
    )
    kept = robots_filter(frontier, rules, wildcards=wildcards).collect()
    return {r["url_canon"].removeprefix("https://w.org") for r in kept}


def test_rfc_wildcard_star_and_dollar(spark):
    """RFC 9309 * spans '/' ; $ anchors only at pattern end."""
    rules = [("w.org", "/fish*.php$", False), ("w.org", "/", True)]
    kept = _gate(
        spark, rules,
        ["/fish/a.php", "/fishx.php", "/fish/a.php?q=1", "/x.php", "/fish"],
    )
    # $ anchors: the query-bearing path does NOT match, stays allowed
    assert kept == {"/fish/a.php?q=1", "/x.php", "/fish"}


def test_rfc_dollar_mid_pattern_is_literal(spark):
    rules = [("w.org", "/p$q", False), ("w.org", "/", True)]
    kept = _gate(spark, rules, ["/p$q/tail", "/pXq", "/p"])
    assert kept == {"/pXq", "/p"}


def test_rfc_metachars_are_literal(spark):
    """'.', '+', '(' in rules must not act as regex."""
    rules = [("w.org", "/a.b", False), ("w.org", "/c+(d", False),
             ("w.org", "/", True)]
    kept = _gate(spark, rules, ["/a.b/x", "/aXb/x", "/c+(d", "/ccd"])
    assert kept == {"/aXb/x", "/ccd"}


def test_rfc_tie_allow_wins(spark):
    """Equal-length allow and disallow both match → allow (RFC 9309
    'least restrictive')."""
    rules = [("w.org", "/dir/*", True), ("w.org", "/dir/a", False),
             ("w.org", "/", False)]
    assert _gate(spark, rules, ["/dir/a"]) == {"/dir/a"}


def test_rfc_gate_equals_prefix_gate_on_wildcard_free_rules(spark):
    """Strict generalization: wildcard-free rule sets gate
    identically under both verdicts."""
    rules = [("w.org", "/no/", False), ("w.org", "/no/yes", True),
             ("w.org", "/", True)]
    paths = ["/no/page", "/no/yes/page", "/fine", "/no", "/"]
    assert _gate(spark, rules, paths, wildcards=True) == _gate(
        spark, rules, paths, wildcards=False
    )


def test_rfc_crawl_parity_with_simulator(spark):
    """Full crawl with wildcard robots: engine fetch order ≡ the
    python-re simulator twin (robots_wildcards on both sides)."""
    from wos_crawler_spark.fixtures import wosgen
    from wos_crawler_spark.fixtures.synth import (
        links_table, pages_table, seeds_table)
    from wos_crawler_spark.functions.urlnorm import with_url_canon
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from wos_crawler_spark.plans.simulator import simulate_crawl

    N = 150
    rules = [
        (wosgen.HOT_HOST, "/rec/*1$", False),  # deny ids ending in 1
        (wosgen.HOT_HOST, "/", True),
    ]
    pages = pages_table(spark, N, partitions=4).cache()
    seeds, links = seeds_table(spark), links_table(spark, N)
    robots = _rules_df(spark, rules)
    cfg = CrawlConfig(delay_s=1.0, parse=False, quota=5, max_waves=3,
                      max_depth=2, max_retries=2, rows_per_bucket=8,
                      robots_wildcards=True)
    res = run_crawl(spark, pages, seeds, links, robots, cfg)
    rows = res.fetch_log.select(
        "wave", "url", "scheduled_ts", "host", "url_hash"
    ).collect()
    rows.sort(key=lambda r: (r["wave"], r["scheduled_ts"], r["host"], r["url_hash"]))
    eng = [(r["wave"], r["url"], round(r["scheduled_ts"], 6)) for r in rows]
    urls = [wosgen.url_of(i) for i in range(N)]
    meta = with_url_canon(
        spark.createDataFrame([(u,) for u in urls], "url string")
    ).collect()
    url_meta = {r["url"]: (r["url_canon"], r["url_hash"], r["host"]) for r in meta}
    texts = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    links_map = {}
    for r in links.collect():
        links_map.setdefault(r["src_url"], []).append(r["dst_url"])
    sim = simulate_crawl(
        pages_urls=set(texts), page_texts=texts,
        seeds=[(r["query_id"], r["term"], r["priority"]) for r in seeds.collect()],
        links=links_map,
        robots={h: [(p, a, len(p)) for hh, p, a in rules if hh == h]
                for h in {wosgen.HOT_HOST}},
        url_meta=url_meta, delay_s=1.0, quota=5, max_waves=3,
        max_depth=2, max_retries=2, rows_per_bucket=8,
        robots_wildcards=True,
    )
    assert len(eng) > 10
    assert eng == sim.fetch_order
    # and the wildcard actually bit: no fetched hot-host url ends in 1
    hot = [u for _, u, _ in eng if wosgen.HOT_HOST in u]
    assert hot and all(not u.endswith("1") for u in hot)
    pages.unpersist()
