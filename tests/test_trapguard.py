"""Crawl-trap guard (operators/trapguard.py): shape rule unit cases +
DuckDB twin parity, trap detection/capping semantics, determinism
under repartitioning, and the one-exchange plan pin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.trapguard import (
    trap_guard,
    trap_shapes,
    url_shape_expr,
    url_shape_sql,
)

URLS = [
    # calendar trap: digit runs collapse
    "https://cal.example.com/2026/08/19",
    "https://cal.example.com/2026/08/20",
    "https://CAL.example.com:8080/1999/01/02",   # case + port fold into host
    # session-id (hex 8+) collapses to H, shorter digit run to D
    "https://s.example.com/sess/deadbeef42abc/p7",
    "https://s.example.com/sess/0123456789abcdef/p8",
    # 8+ pure digits are hex-eligible -> H (documented ordering)
    "https://n.example.com/id/12345678",
    # 7 digits stay a digit run -> D
    "https://n.example.com/id/1234567",
    # query values -> V, keys kept
    "https://q.example.com/s?item=42&page=3",
    "https://q.example.com/s?item=kettle&page=9",
    "https://q.example.com/s?other=1",
]


def _shapes_spark(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url_canon string")
    return [
        r["s"]
        for r in df.select(url_shape_expr("url_canon").alias("s")).collect()
    ]


def test_shape_rule_cases(spark):
    got = _shapes_spark(spark)
    assert got[0] == got[1] == got[2] == "cal.example.com/D/D/D"
    assert got[3] == got[4] == "s.example.com/sess/H/pD"
    assert got[5] == "n.example.com/id/H"
    assert got[6] == "n.example.com/id/D"
    assert got[7] == got[8] == "q.example.com/s?item=V&page=V"
    assert got[9] == "q.example.com/s?other=V"


def test_shape_duckdb_twin_parity(spark):
    got = _shapes_spark(spark)
    con = duckdb.connect()
    sql = url_shape_sql("u")
    db = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS u)", [u]).fetchone()[0]
        for u in URLS
    ]
    assert db == got


def _frontier(spark, partitions=4):
    rows = []
    for i in range(40):  # one trap shape: /cal/D/D (40 distinct urls)
        rows.append((f"https://t.org/cal/{2000 + i}/{i % 12}", i))
    for i in range(5):  # small shape: /pN (5 distinct)
        rows.append((f"https://t.org/p{i}", 100 + i))
    rows.append(("https://t.org/p0", 200))  # duplicate url row
    return spark.createDataFrame(
        rows, "url_canon string, meta int"
    ).repartition(partitions)


def test_trap_shapes_counts(spark):
    stats = {
        (r["shape"]): (r["n_urls"], r["is_trap"])
        for r in trap_shapes(_frontier(spark), cap=10).collect()
    }
    assert stats["t.org/cal/D/D"] == (40, True)
    assert stats["t.org/pD"] == (5, False)  # duplicate row counts once


def test_trap_guard_caps_and_passes(spark):
    out = trap_guard(_frontier(spark), cap=10, keep=3)
    urls = sorted(r["url_canon"] for r in out.collect())
    # non-trap shape intact, INCLUDING its duplicate row
    assert sum(u.startswith("https://t.org/p") for u in urls) == 6
    # trap shape keeps its 3 lexicographically smallest urls
    kept_cal = [u for u in urls if "/cal/" in u]
    assert kept_cal == sorted(
        f"https://t.org/cal/{2000 + i}/{i % 12}" for i in range(40)
    )[:3]
    assert out.columns == ["url_canon", "meta"]  # passthrough schema


def test_keep_zero_drops_whole_shape(spark):
    out = trap_guard(_frontier(spark), cap=10, keep=0)
    assert all("/cal/" not in r["url_canon"] for r in out.collect())


def test_keep_default_is_cap_and_bounds(spark):
    out = trap_guard(_frontier(spark), cap=7)
    assert sum("/cal/" in r["url_canon"] for r in out.collect()) == 7
    with pytest.raises(ValueError):
        trap_guard(_frontier(spark), cap=5, keep=6)


def test_null_url_rows_pass_through_safe_branch(spark):
    """NULL-url rows (shape NULL) must survive the guard whether or
    not traps exist — isin() evaluates NULL for them, so without the
    explicit route they'd vanish from trap-present frontiers."""
    base = _frontier(spark)
    with_null = base.unionByName(
        spark.createDataFrame([(None, 999)], "url_canon string, meta int")
    )
    # trap present: NULL row still there, trap still capped
    out = trap_guard(with_null, cap=10, keep=3).collect()
    assert sum(r["url_canon"] is None for r in out) == 1
    assert sum("/cal/" in (r["url_canon"] or "") for r in out) == 3
    # no traps: identity plan keeps the NULL row trivially
    out2 = trap_guard(with_null, cap=100).collect()
    assert sum(r["url_canon"] is None for r in out2) == 1


def test_partitioning_invariance(spark):
    a = sorted(
        (r["url_canon"], r["meta"])
        for r in trap_guard(_frontier(spark, 1), cap=10, keep=3).collect()
    )
    b = sorted(
        (r["url_canon"], r["meta"])
        for r in trap_guard(_frontier(spark, 7), cap=10, keep=3).collect()
    )
    assert a == b


def test_full_crawl_parity_with_simulator(spark):
    """CrawlConfig.trap_cap wired through the wave loop: fetch-order
    AND seen-set equality vs the python simulator under an active
    trap cap (the synth urls /rec/00000042 share one shape per host,
    so the cap genuinely culls)."""
    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.fixtures import wosgen
    from wos_crawler_spark.functions.urlnorm import with_url_canon
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from wos_crawler_spark.plans.simulator import simulate_crawl

    n = 200
    cfg_common = dict(
        quota=5, max_waves=3, max_depth=2, max_retries=2,
        rows_per_bucket=8, trap_cap=6, trap_keep=4,
    )
    pages = pages_table(spark, n, partitions=4)
    links = links_table(spark, n)
    eng = run_crawl(
        spark, pages, seeds_table(spark), links, robots_table(spark),
        CrawlConfig(delay_s=1.0, parse=False, **cfg_common),
    )
    urls = [wosgen.url_of(i) for i in range(n)]
    meta_rows = with_url_canon(
        spark.createDataFrame([(u,) for u in urls], "url string")
    ).collect()
    url_meta = {
        r["url"]: (r["url_canon"], r["url_hash"], r["host"])
        for r in meta_rows
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
    sim = simulate_crawl(
        pages_urls=set(page_texts),
        page_texts=page_texts,
        seeds=seed_list,
        links=links_map,
        robots=robots_map,
        url_meta=url_meta,
        delay_s=1.0,
        **cfg_common,
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
    # the cap actually bit: an uncapped run fetches strictly more
    uncapped = simulate_crawl(
        pages_urls=set(page_texts), page_texts=page_texts,
        seeds=seed_list, links=links_map, robots=robots_map,
        url_meta=url_meta, delay_s=1.0,
        **{**cfg_common, "trap_cap": None, "trap_keep": None},
    )
    assert len(uncapped.fetch_order) > len(sim.fetch_order)


def test_plan_safe_path_never_sorted(spark):
    """The round-4 shape: a zero-trap frontier passes through as the
    IDENTICAL plan (no join, no sort, no extra branch); with traps,
    the trap set is a driver literal (isin), the safe branch never
    sorts, and only trap rows reach the rank window."""
    f = _frontier(spark)
    # zero traps (cap above every shape count) → the very same plan
    assert trap_guard(f, cap=10_000) is f
    plan = (
        trap_guard(f, cap=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Sort in the plan belongs to the trap branch's rank window
    # (partial + final around its exchange); the safe branch and the
    # count aggregates never sort a row
    assert "dense_rank" in plan
    before_window = plan.split("Window [")[0]
    assert "+- Sort " not in before_window, before_window
    # the trap set is a map-side literal filter, not a join
    assert "Join" not in plan
