"""Raw robots.txt parsing (F3 front-end): RFC 9309 group semantics,
agent specificity, empty-Disallow, comments/CRLF, and the Spark
mapInPandas wrapper feeding robots_filter end-to-end."""

from wos_crawler_spark.operators.robots import parse_robots_body

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
