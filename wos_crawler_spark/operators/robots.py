"""robots.txt gate as a shuffle-free broadcast longest-prefix-match
join (SURVEY.md F3/J2).

Reference behavior: ``dep:scrapy.downloadermiddlewares.robotstxt::
RobotsTxtMiddleware`` gated by ``ref:wos_crawler/settings.py::
ROBOTSTXT_OBEY`` † — per-host rules fetched once, each request checked
against the longest matching rule prefix.

Spark-first: rules are grouped into one array per host (tiny dim
table), broadcast-joined on ``host`` (no shuffle of the frontier, no
row fan-out), and the longest-prefix match is evaluated per row with
codegen'd higher-order array functions (``filter`` + ``array_sort``).
Hosts with no matching rule are allowed (crawler default when no
robots.txt exists). At 10^10 frontier rows this is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_path(url_col: Column) -> Column:
    """Path + query of a canonical URL ('' → '/'). robots.txt rule
    prefixes may reach into the query string (`/search?q=` is a
    standard Disallow) — matching on the bare path would silently
    allow everything such a rule denies. Canonical URLs carry no
    fragment, so everything after the authority is matchable. The
    single-threaded simulator matches the same span. The scheme may be
    EMPTY (urlnorm's degenerate scheme-less canonical form) — the
    simulator's split('://')[1] handles it, so the engine must too."""
    p = F.regexp_extract(url_col, r"^[^:/?#]*://[^/?#]*([^#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_verdict(path: Column, rules: Column) -> Column:
    """True iff the longest matching rule allows (or none matches).

    ``rules``: array<struct<rule_len int, rule_prefix string,
    allow boolean>> — rule_len FIRST so struct ordering sorts by it."""
    matched = F.filter(rules, lambda r: path.startswith(r["rule_prefix"]))
    best = F.element_at(F.array_sort(matched), -1)  # max rule_len last
    return F.when(
        rules.isNull() | (F.size(matched) == 0), F.lit(True)
    ).otherwise(best["allow"])


def robots_rules_by_host(robots: DataFrame) -> DataFrame:
    """Collapse (host, rule_prefix, allow, rule_len) rows into one
    rules-array row per host (the broadcastable dim)."""
    return robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.col("rule_len").alias("rule_len"),
                F.col("rule_prefix").alias("rule_prefix"),
                F.col("allow").alias("allow"),
            )
        ).alias("_rules")
    )


def robots_filter(frontier: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop frontier rows whose longest-prefix robots rule disallows.

    ``frontier`` needs (url_canon, host); ``robots`` is
    (host, rule_prefix, allow, rule_len)."""
    if robots is None:
        return frontier
    by_host = robots_rules_by_host(robots)
    path = url_path(F.col("url_canon"))
    return (
        frontier.join(F.broadcast(by_host), "host", "left")
        .filter(robots_verdict(path, F.col("_rules")))
        .drop("_rules")
    )
