"""Adaptive host backoff: engine-plan ≡ python-twin rule equality
(incl. exact integer boundaries and dim merging), stats folding, and
the full-crawl parity test — fetch-order AND seen-set equality engine
vs simulator with a dead host that gets quarantined mid-crawl."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.backoff import (
    backoff_plan,
    backoff_python,
    fold_host_stats,
)

STATS = [
    # host, sched, miss
    ("clean.org", 10, 0),        # healthy
    ("flaky.org", 10, 5),        # exactly 50% -> backed at err_pct=50
    ("dying.org", 10, 9),        # 90% -> quarantined at 90
    ("fresh.org", 2, 2),         # 100% but under min_fetches
    ("meh.org", 10, 4),          # 40% -> untouched
]


def _plan_rows(spark, base=1.0, dims=None, **kw):
    stats = spark.createDataFrame(STATS, "host string, sched long, miss long")
    dim = (
        spark.createDataFrame(dims, "host string, crawl_delay double")
        if dims
        else None
    )
    return {
        r.host: (r.crawl_delay, r.quarantined)
        for r in backoff_plan(stats, base, dim, **kw).collect()
    }


def test_rules_and_boundaries(spark):
    got = _plan_rows(spark, min_fetches=4, err_pct=50, factor=4,
                     quarantine_pct=90)
    # exact boundary: 5*100 == 50*10 -> backed; 9*100 == 90*10 -> quar
    assert got["flaky.org"] == (4.0, False)
    assert got["dying.org"] == (4.0, True)
    # compact dim: default-delay healthy hosts and under-min hosts absent
    assert "clean.org" not in got
    assert "fresh.org" not in got
    assert "meh.org" not in got


def test_dim_merge_multiplies_base(spark):
    got = _plan_rows(
        spark, dims=[("flaky.org", 2.5), ("slowrobots.org", 3.0)],
        min_fetches=4, err_pct=50, factor=4, quarantine_pct=90,
    )
    # backed host with a robots Crawl-delay: ITS base is multiplied
    assert got["flaky.org"] == (10.0, False)
    # dim-only host (no stats) keeps its dim delay, not quarantined
    assert got["slowrobots.org"] == (3.0, False)


def test_twin_equality(spark):
    for kw in (
        dict(min_fetches=4, err_pct=50, factor=4, quarantine_pct=90),
        dict(min_fetches=1, err_pct=25, factor=3, quarantine_pct=100),
        dict(min_fetches=11, err_pct=50, factor=2, quarantine_pct=90),
    ):
        for dims in (None, [("flaky.org", 2.5), ("slowrobots.org", 3.0)]):
            got = _plan_rows(spark, dims=dims, **kw)
            eff, quar = backoff_python(
                {h: (s, m) for h, s, m in STATS}, 1.0,
                dict(dims) if dims else None, **kw,
            )
            # twin's eff map includes defaults-only entries the compact
            # plan drops; compare on the plan's keys + quarantine set
            assert {h for h, (_, q) in got.items() if q} == quar
            for h, (d, _) in got.items():
                assert eff.get(h, 1.0) == d, (h, kw)


def test_fold_host_stats(spark):
    w1 = spark.createDataFrame(
        [("a.org", "x"), ("a.org", None), ("b.org", "y")],
        "host string, probe string",
    )
    s1 = fold_host_stats(None, w1, "probe")
    w2 = spark.createDataFrame(
        [("a.org", None), ("c.org", "z")], "host string, probe string"
    )
    s2 = {
        r.host: (r.sched, r.miss)
        for r in fold_host_stats(s1, w2, "probe").collect()
    }
    assert s2 == {"a.org": (3, 2), "b.org": (1, 0), "c.org": (1, 0)}


def test_guards(spark):
    stats = spark.createDataFrame(STATS, "host string, sched long, miss long")
    with pytest.raises(ValueError):
        backoff_plan(stats, 1.0, min_fetches=0)
    with pytest.raises(ValueError):
        backoff_plan(stats, 1.0, err_pct=0)
    with pytest.raises(ValueError):
        backoff_plan(stats, 1.0, quarantine_pct=101)


def test_full_crawl_parity_with_simulator_under_backoff(spark):
    """CrawlConfig.backoff wired through the wave loop: fetch-order
    AND seen-set equality vs the python simulator with (a) a dead
    host whose links all 404 — quarantined once its cumulative miss
    rate crosses the threshold — and (b) organic partial-miss hosts
    that cross the slow-down threshold and get delay×factor, which
    the order equality verifies end-to-end (scheduled_ts would
    diverge otherwise)."""
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

    n = 200
    bo_kw = dict(min_fetches=3, err_pct=25, factor=3, quarantine_pct=90)
    cfg_common = dict(
        quota=5, max_waves=4, max_depth=3, max_retries=2,
        rows_per_bucket=8,
    )
    pages = pages_table(spark, n, partitions=4)
    dead = []
    for i in range(0, n, 2):
        dead.append((wosgen.url_of(i), f"https://dead.example.org/p{i}"))
    # flaky: the hot host keeps its real (hit) pages but also sprouts
    # missing paths — cumulative miss rate lands in the slow-down band
    # (its wave-0 hits keep it under the quarantine threshold)
    for i in range(1, 60, 2):
        dead.append(
            (wosgen.url_of(i), f"https://{wosgen.HOT_HOST}/missing{i}")
        )
    links = links_table(spark, n).unionByName(
        spark.createDataFrame(dead, "src_url string, dst_url string")
    )
    eng = run_crawl(
        spark, pages, seeds_table(spark), links, robots_table(spark),
        CrawlConfig(
            delay_s=1.0, parse=False, backoff=True,
            backoff_kwargs=bo_kw, **cfg_common,
        ),
    )
    urls = [wosgen.url_of(i) for i in range(n)] + [d for _, d in dead]
    meta_rows = with_url_canon(
        spark.createDataFrame([(u,) for u in set(urls)], "url string")
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
    sim_kwargs = dict(
        pages_urls=set(page_texts), page_texts=page_texts,
        seeds=seed_list, links=links_map, robots=robots_map,
        url_meta=url_meta, delay_s=1.0, **cfg_common,
    )
    sim = simulate_crawl(backoff=True, backoff_kwargs=bo_kw, **sim_kwargs)

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

    # the dead host was fetched early, then cut off: no dead-host
    # fetches in the final wave even though fresh dead links keep
    # arriving from expansions
    dead_waves = [
        w for w, u, _ in engine_order if "dead.example.org" in u
    ]
    assert dead_waves, "dead host never scheduled — world broken"
    last_wave = max(w for w, _, _ in engine_order)
    assert max(dead_waves) < last_wave

    # and backoff genuinely bit: without it the crawl fetches strictly
    # more dead-host urls (retries + fresh admissions keep flowing)
    plain = simulate_crawl(**sim_kwargs)
    n_dead_plain = sum(
        1 for _, u, _ in plain.fetch_order if "dead.example.org" in u
    )
    n_dead_bo = len(dead_waves)
    assert n_dead_plain > n_dead_bo

    # at least one surviving host crossed the slow-down threshold at
    # the final fold — evidence the delay-multiplication path (not
    # just quarantine) was exercised by the parity above
    stats: dict = {}
    for f in sim.fetches:
        st = stats.setdefault(f.host, [0, 0])
        st[0] += 1
        st[1] += 0 if f.hit else 1
    slowed = [
        h
        for h, (s, m) in stats.items()
        if s >= bo_kw["min_fetches"]
        and m * 100 >= bo_kw["err_pct"] * s
        and m * 100 < bo_kw["quarantine_pct"] * s
    ]
    assert slowed, "no host entered the slow-down band; weaken err_pct"


def test_backoff_resume_equals_uninterrupted(spark, tmp_path):
    """Backoff stats are checkpointed with the wave: an interrupted
    backoff crawl resumed from checkpoint reproduces the
    uninterrupted run's seen set and per-wave metrics exactly — the
    quarantine/slow-down decisions depend on cumulative host history,
    which must survive the restart."""
    from wos_crawler_spark.fixtures import wosgen
    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.operators import checkpoint as ckpt
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl

    n = 120
    pages = pages_table(spark, n, partitions=4).cache()
    dead = [
        (wosgen.url_of(i), f"https://dead.example.org/p{i}")
        for i in range(0, n, 2)
    ]
    links = links_table(spark, n).unionByName(
        spark.createDataFrame(dead, "src_url string, dst_url string")
    )
    seeds, robots = seeds_table(spark), robots_table(spark)
    common = dict(
        delay_s=1.0, quota=4, max_depth=3, rows_per_bucket=8, parse=False,
        backoff=True,
        backoff_kwargs=dict(min_fetches=3, err_pct=25, factor=3,
                            quarantine_pct=90),
    )

    full_dir = str(tmp_path / "full")
    run_crawl(spark, pages, seeds, links, robots,
              CrawlConfig(max_waves=4, ckpt_dir=full_dir, **common))

    part_dir = str(tmp_path / "part")
    run_crawl(spark, pages, seeds, links, robots,
              CrawlConfig(max_waves=2, ckpt_dir=part_dir, **common))
    resumed = run_crawl(
        spark, pages, seeds, links, robots,
        CrawlConfig(max_waves=4, ckpt_dir=part_dir, **common),
        resume=True,
    )
    assert resumed.waves[0].wave == 2

    last = ckpt.latest_wave(full_dir)
    seen_full = {
        r.url_hash for r in ckpt.read_seen(spark, full_dir, last).collect()
    }
    seen_part = {
        r.url_hash for r in ckpt.read_seen(spark, part_dir, last).collect()
    }
    assert seen_full == seen_part
    for w in range(last + 1):
        assert ckpt.read_metrics(full_dir, w) == ckpt.read_metrics(part_dir, w)
    # and the persisted stats agree at the end
    sf = {
        r.host: (r.sched, r.miss)
        for r in ckpt.read_host_stats(spark, full_dir, last).collect()
    }
    sp = {
        r.host: (r.sched, r.miss)
        for r in ckpt.read_host_stats(spark, part_dir, last).collect()
    }
    assert sf == sp and sf
