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


def parse_robots_body_full(
    body: str, user_agent: str = "*"
) -> tuple[list[tuple[str, bool, int]], float | None]:
    """Parse ONE raw robots.txt body for the given crawler product
    token → ``([(rule_prefix, allow, rule_len)], crawl_delay_seconds)``
    (RFC 9309 semantics; Crawl-delay is the de-facto extension honored
    by Bing/Yandex-class crawlers):

    - groups = consecutive ``User-agent:`` lines + their Allow/Disallow
      rules; a ``User-agent`` after at least one rule starts a NEW group;
    - group selection: the MOST SPECIFIC matching agent wins — exact
      token match (case-insensitive) beats ``*``; every group at the
      winning specificity contributes its rules (RFC: groups with the
      same chosen agent merge);
    - ``Disallow:`` with an empty value is "allow everything" — no rule;
    - ``Crawl-delay:`` is group-scoped like Allow/Disallow; when several
      winning groups carry one, the MAX (most conservative) applies;
      non-numeric or negative values are ignored;
    - comments (``#``) and unknown directives (Sitemap, ...) are
      ignored; CRLF/whitespace tolerant.

    Longest-prefix-match evaluation is :func:`robots_verdict`'s job —
    this emits the rule rows the broadcast dim table is built from."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    in_agents = False
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip().rstrip("\r")
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:  # rule block ended → new group begins
                if agents:
                    groups.append((agents, rules, delay))
                agents, rules, delay = [], [], None
                in_agents = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if val == "":
                if key == "disallow":
                    continue  # empty Disallow = no restriction
                continue  # empty Allow is meaningless too
            rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            in_agents = False
            try:
                d = float(val)
            except ValueError:
                continue
            if d >= 0:
                delay = d if delay is None else max(delay, d)
        else:
            in_agents = False  # Sitemap etc. terminate the agent run
    if agents:
        groups.append((agents, rules, delay))

    # specificity: exact product-token match > '*'; longest token wins
    def spec(agent: str) -> int:
        if agent == ua:
            return 2
        if agent == "*":
            return 1
        return 0

    best = 0
    for agents, _, _ in groups:
        for a in agents:
            best = max(best, spec(a))
    if best == 0:
        return [], None
    out = []
    out_delay: float | None = None
    for agents, g_rules, g_delay in groups:
        if max((spec(a) for a in agents), default=0) == best:
            out.extend(
                (prefix, allow, len(prefix)) for prefix, allow in g_rules
            )
            if g_delay is not None:
                out_delay = (
                    g_delay if out_delay is None else max(out_delay, g_delay)
                )
    return out, out_delay


def parse_robots_body(
    body: str, user_agent: str = "*"
) -> list[tuple[str, bool, int]]:
    """Rules-only view of :func:`parse_robots_body_full`."""
    return parse_robots_body_full(body, user_agent)[0]


def parse_robots_pages(
    robots_pages: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """``(host, body)`` rows of raw robots.txt payloads → the
    ``(host, rule_prefix, allow, rule_len)`` rules table
    :func:`robots_filter` consumes. One Arrow-batched ``mapInPandas``
    (robots corpora are per-host tiny; this is a dim-table build)."""
    import pandas as pd

    def _parse(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hosts, prefixes, allows, lens = [], [], [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if not isinstance(body, str):
                    continue
                for prefix, allow, rl in parse_robots_body(body, user_agent):
                    hosts.append(host)
                    prefixes.append(prefix)
                    allows.append(allow)
                    lens.append(rl)
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "rule_prefix": prefixes,
                    "allow": allows,
                    "rule_len": lens,
                }
            )

    return robots_pages.select(host_col, body_col).mapInPandas(
        _parse, "host string, rule_prefix string, allow boolean, rule_len int"
    )


def parse_robots_delays(
    robots_pages: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """``(host, body)`` rows of raw robots.txt payloads → the
    ``(host, crawl_delay)`` per-host delay dim
    :func:`~wos_crawler_spark.operators.politeness.schedule_wave`
    consumes via ``host_delays``. Hosts whose winning group carries no
    (valid) Crawl-delay emit NO row — the scheduler's default applies.
    Same Arrow-batched dim-table build as :func:`parse_robots_pages`."""
    import pandas as pd

    def _parse(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hosts, delays = [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if not isinstance(body, str):
                    continue
                _, d = parse_robots_body_full(body, user_agent)
                if d is not None:
                    hosts.append(host)
                    delays.append(d)
            yield pd.DataFrame({"host": hosts, "crawl_delay": delays})

    return robots_pages.select(host_col, body_col).mapInPandas(
        _parse, "host string, crawl_delay double"
    )


def parse_robots_sitemaps(
    robots_pages: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``(host, body)`` raw robots.txt payloads → distinct
    ``(host, sitemap_url)`` rows from ``Sitemap:`` directives — the
    crawler's seed-discovery channel (S1 family; the reference's seed
    list is hand-written, a web crawler bootstraps from sitemaps).

    Per RFC 9309 §2.3 / sitemaps.org, ``Sitemap:`` is NOT group-scoped
    — it applies regardless of user-agent, so unlike the rule parser
    this needs no group machinery and is a pure Catalyst expression
    pipeline (explode lines → strip comments → regex-extract), fully
    SQL-oracle-able and codegen'd: the robots corpus is a per-host dim
    (O(hosts) rows), but at 10^8 hosts map-side exprs still beat an
    Arrow round-trip."""
    lines = robots_pages.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")
        ).alias("_l"),
    )
    clean = F.regexp_replace(F.col("_l"), "#.*", "")
    url = F.regexp_extract(clean, r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$", 1)
    return (
        lines.select("host", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def compile_robots_pattern(p: Column) -> Column:
    """RFC 9309 §2.2.2/§2.2.3 pattern → anchored regex, as pure exprs
    in the Java∩RE2 dialect: ``*`` matches any char run (including
    ``/``), ``$`` anchors ONLY at the pattern's end (elsewhere it is
    literal — the RFC leaves it undefined; we pin literal), everything
    else is literal. Three passes: escape every regex metachar, then
    un-escape the two RFC constructs (``\\*`` → ``.*``, trailing
    ``\\$`` → ``$``), then anchor at the start. Plain prefixes compile
    to ``^literal`` — identical verdicts to startswith, so the RFC
    gate is a strict generalization of the LPM gate."""
    esc = F.regexp_replace(p, r"([\\.^$+?()\[\]{}|*])", r"\\$1")
    star = F.regexp_replace(esc, r"\\\*", ".*")
    # replacement-side $ is a group reference in Java — escape it
    end = F.regexp_replace(star, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), end)


def robots_rules_by_host_rfc(robots: DataFrame) -> DataFrame:
    """RFC-wildcard twin of :func:`robots_rules_by_host`: patterns are
    compiled ONCE while building the tiny broadcast dim. Struct field
    order (rule_len, allow, regex) makes the array_sort tie-break
    allow-wins at equal length — RFC 9309 §2.2.2: 'the most specific
    match found MUST be used ... least restrictive' on ties. (The
    prefix gate never needs this: equal-length matching PREFIXES of
    one path are the same string; equal-length wildcard patterns can
    differ.)"""
    return robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.col("rule_len").alias("rule_len"),
                F.col("allow").alias("allow"),
                compile_robots_pattern(F.col("rule_prefix")).alias(
                    "rule_regex"
                ),
            )
        ).alias("_rules")
    )


def robots_verdict_rfc(path: Column, rules: Column) -> Column:
    """True iff the longest matching RFC-9309 pattern allows (ties →
    allow), or no rule matches. ``rules``: array<struct<rule_len int,
    allow boolean, rule_regex string>> from robots_rules_by_host_rfc.
    Per-rule ``regexp_like`` with a column pattern runs interpreted —
    fine for a per-host rules array (tens of rules), and the dim is
    broadcast so this stays map-side."""
    matched = F.filter(
        rules, lambda r: F.regexp_like(path, r["rule_regex"])
    )
    best = F.element_at(F.array_sort(matched), -1)
    return F.when(
        rules.isNull() | (F.size(matched) == 0), F.lit(True)
    ).otherwise(best["allow"])


def robots_filter(
    frontier: DataFrame,
    robots: DataFrame | None,
    wildcards: bool = False,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Drop frontier rows whose winning robots rule disallows.

    ``frontier`` needs (url_canon, host); ``robots`` is
    (host, rule_prefix, allow, rule_len). Default = longest-prefix
    match (the simulator-pinned crawl contract); ``wildcards=True``
    switches to full RFC 9309 ``*``/``$`` semantics
    (CrawlConfig.robots_wildcards plumbs this through run_crawl) —
    byte-identical verdicts on wildcard-free rule sets.

    ``broadcast_dims``: the per-host rules dim broadcasts by default —
    right whenever it fits the driver/executors. At the 10^10-URL
    design point a Common-Crawl-shaped robots table spans 10^7–10^8
    hosts with rule arrays and will NOT broadcast (driver OOM / 8 GB
    hard cap); ``False`` drops the hint so the join keys on host —
    one bounded host-keyed exchange that AQE may still convert back
    to broadcast if runtime stats allow. run_crawl sizes the dim once
    per crawl (CrawlConfig.dim_broadcast_threshold) and plumbs the
    verdict here; verdict semantics are identical either way
    (parity-tested in both modes)."""
    if robots is None:
        return frontier
    path = url_path(F.col("url_canon"))
    if wildcards:
        by_host = robots_rules_by_host_rfc(robots)
        verdict = robots_verdict_rfc(path, F.col("_rules"))
    else:
        by_host = robots_rules_by_host(robots)
        verdict = robots_verdict(path, F.col("_rules"))
    if broadcast_dims:
        by_host = F.broadcast(by_host)
    return (
        frontier.join(by_host, "host", "left")
        .filter(verdict)
        .drop("_rules")
    )
