"""Frontier semantics vs the single-threaded simulator oracle
(SURVEY.md §5.2-2/3): fetch-order equality, seen-set equality,
politeness invariant, robots invariant, partitioning-independence."""

import math

import pytest
from pyspark.sql import functions as F

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

N = 200
DELAY = 1.0
CFG = dict(quota=5, max_waves=3, max_depth=2, max_retries=2, rows_per_bucket=8)


@pytest.fixture(scope="module")
def world(spark):
    pages = pages_table(spark, N, partitions=4).cache()
    seeds = seeds_table(spark)
    robots = robots_table(spark)
    links = links_table(spark, N).cache()
    # url metadata for the simulator (hashes computed by Spark once)
    urls = [wosgen.url_of(i) for i in range(N)]
    meta_rows = with_url_canon(
        spark.createDataFrame([(u,) for u in urls], "url string")
    ).collect()
    url_meta = {r["url"]: (r["url_canon"], r["url_hash"], r["host"]) for r in meta_rows}
    page_texts = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    links_map = {}
    for r in links.collect():
        links_map.setdefault(r["src_url"], []).append(r["dst_url"])
    robots_map = {}
    for r in robots.collect():
        robots_map.setdefault(r["host"], []).append(
            (r["rule_prefix"], r["allow"], r["rule_len"])
        )
    seed_list = [(r["query_id"], r["term"], r["priority"]) for r in seeds.collect()]
    return dict(
        pages=pages, seeds=seeds, robots=robots, links=links,
        url_meta=url_meta, page_texts=page_texts, links_map=links_map,
        robots_map=robots_map, seed_list=seed_list,
    )


@pytest.fixture(scope="module")
def engine_run(spark, world):
    cfg = CrawlConfig(delay_s=DELAY, parse=False, **CFG)
    return run_crawl(
        spark, world["pages"], world["seeds"], world["links"], world["robots"], cfg
    )


@pytest.fixture(scope="module")
def sim_run(world):
    return simulate_crawl(
        pages_urls=set(world["page_texts"]),
        page_texts=world["page_texts"],
        seeds=world["seed_list"],
        links=world["links_map"],
        robots=world["robots_map"],
        url_meta=world["url_meta"],
        delay_s=DELAY,
        **CFG,
    )


def _engine_fetch_order(result):
    rows = result.fetch_log.select(
        "wave", "url", "scheduled_ts", "host", "url_hash"
    ).collect()
    rows.sort(key=lambda r: (r["wave"], r["scheduled_ts"], r["host"], r["url_hash"]))
    return [(r["wave"], r["url"], round(r["scheduled_ts"], 6)) for r in rows]


def test_fetch_order_matches_simulator(engine_run, sim_run):
    """North-rule correctness gate: crawl ordering equality."""
    engine_order = _engine_fetch_order(engine_run)
    assert len(engine_order) > 20
    assert engine_order == sim_run.fetch_order


def test_seen_set_matches_simulator(engine_run, sim_run):
    """North-rule correctness gate: URL-seen set equality (U2/U4)."""
    engine_seen = {r["url_hash"] for r in engine_run.seen.collect()}
    assert engine_seen == sim_run.seen
    # U4: DataFrame-level intersect diagnostic — |seen ∩ oracle| == |seen|
    spark = engine_run.seen.sparkSession
    oracle = spark.createDataFrame(
        [(h,) for h in sorted(sim_run.seen)], "url_hash long"
    )
    inter = engine_run.seen.select("url_hash").distinct().intersect(oracle)
    assert inter.count() == len(sim_run.seen)


def test_politeness_invariant(engine_run):
    """Per host, within a wave: every inter-fetch gap ≥ delay (exact
    rate preservation under salting, SURVEY §7.3)."""
    rows = engine_run.fetch_log.select("wave", "host", "scheduled_ts").collect()
    by = {}
    for r in rows:
        by.setdefault((r["wave"], r["host"]), []).append(r["scheduled_ts"])
    checked = 0
    for ts in by.values():
        ts.sort()
        for a, b in zip(ts, ts[1:]):
            assert b - a >= DELAY - 1e-9
            checked += 1
    assert checked > 0


def test_robots_invariant(engine_run, world):
    """No disallowed URL is ever fetched."""
    fetched = [r["url"] for r in engine_run.fetch_log.select("url").collect()]
    for url in fetched:
        canon, _, host = world["url_meta"][url]
        path = "/" + canon.split("://", 1)[1].split("/", 1)[1]
        for prefix, allow, _ in sorted(
            world["robots_map"].get(host, []), key=lambda t: -t[2]
        ):
            if path.startswith(prefix):
                assert allow, url
                break


def test_hot_host_salted(engine_run):
    """The hot host (30% of frontier) must be split into >1 politeness
    bucket (north_rule: salted-key repartition to kill skew)."""
    salts = (
        engine_run.fetch_log.filter(F.col("host") == wosgen.HOT_HOST)
        .select("salt")
        .distinct()
        .count()
    )
    assert salts > 1


def test_partitioning_independence(spark, world, engine_run):
    """Same crawl with a different input partitioning ⇒ identical fetch
    log (the sandbox proxy for local[8] ≡ local[32]; ordering is
    data-derived, SURVEY §4)."""
    cfg = CrawlConfig(delay_s=DELAY, parse=False, **CFG)
    pages16 = world["pages"].repartition(16)
    links1 = world["links"].coalesce(1)
    rerun = run_crawl(spark, pages16, world["seeds"], links1, world["robots"], cfg)
    assert _engine_fetch_order(rerun) == _engine_fetch_order(engine_run)


def test_wave_metrics(engine_run):
    m = engine_run.metrics
    assert m[0]["scheduled"] > 0 and m[0]["hits"] == m[0]["scheduled"]
    # expansion happened into wave 1
    assert len(m) > 1 and m[1]["scheduled"] > 0
    # per-gate admission-funnel counters: one row per stage boundary
    # per wave, monotonically non-increasing along the fresh path, so
    # per-gate drop attribution is consecutive-stage subtraction
    rep = engine_run.gate_report()
    assert rep is not None
    assert set(rep.columns) == {"wave", "stage_order", "stage", "rows"}
    rows = rep.collect()
    by_wave: dict[int, dict[str, int]] = {}
    for r in rows:
        by_wave.setdefault(r["wave"], {})[r["stage"]] = r["rows"]
    for w in engine_run.waves:
        stages = by_wave[w.wave]
        for s in ("input", "post_robots", "post_urlgate", "post_trap",
                  "post_dedup", "retry_bypass"):
            assert s in stages, (w.wave, stages)
        # the funnel only narrows (retries are counted separately)
        assert stages["input"] >= stages["post_robots"]
        fresh_in = stages["post_robots"] - stages["retry_bypass"]
        assert fresh_in >= stages["post_urlgate"] >= stages["post_trap"]
        assert stages["post_trap"] >= stages["post_dedup"]
        # everything the wave scheduled came through the funnel
        assert w.scheduled <= stages["post_dedup"] + stages["retry_bypass"]


def test_disk_only_join_caches_identical_output(spark, world, engine_run):
    """join_cache_storage=DISK_ONLY is a pure storage-layer knob: the
    crawl's fetch order must be byte-identical to the default cache."""
    cfg = CrawlConfig(
        delay_s=DELAY, parse=False, join_cache_storage="DISK_ONLY", **CFG
    )
    alt = run_crawl(
        spark, world["pages"], world["seeds"], world["links"],
        world["robots"], cfg,
    )
    assert _engine_fetch_order(alt) == _engine_fetch_order(engine_run)


def test_crawl_delay_parity_with_simulator(spark, world):
    """Per-host robots Crawl-delay (F3→F4): full-crawl fetch-order AND
    seen-set equality vs the simulator given the same per-host delay
    map; plus the per-host gap invariant at each host's own rate."""
    hosts = sorted({h for (_, _, h) in world["url_meta"].values()})
    delay_map = {hosts[0]: 2.0, hosts[-1]: 0.5}
    delays_df = spark.createDataFrame(
        list(delay_map.items()), "host string, crawl_delay double"
    )
    cfg = CrawlConfig(delay_s=DELAY, parse=False, **CFG)
    eng = run_crawl(
        spark, world["pages"], world["seeds"], world["links"],
        world["robots"], cfg, host_delays=delays_df,
    )
    sim = simulate_crawl(
        pages_urls=set(world["page_texts"]),
        page_texts=world["page_texts"],
        seeds=world["seed_list"],
        links=world["links_map"],
        robots=world["robots_map"],
        url_meta=world["url_meta"],
        delay_s=DELAY,
        host_delays=delay_map,
        **CFG,
    )
    assert _engine_fetch_order(eng) == sim.fetch_order
    assert {r["url_hash"] for r in eng.seen.collect()} == sim.seen
    rows = eng.fetch_log.select("wave", "host", "scheduled_ts").collect()
    by = {}
    for r in rows:
        by.setdefault((r["wave"], r["host"]), []).append(r["scheduled_ts"])
    checked_slow = 0
    for (_, host), ts in by.items():
        ts.sort()
        want = delay_map.get(host, DELAY)
        for a, b in zip(ts, ts[1:]):
            assert b - a >= want - 1e-9
            checked_slow += want != DELAY
    assert checked_slow > 0


def test_cuckoo_seen_filter_identical_output(spark, world, engine_run):
    """seen_filter='cuckoo' swaps the URL-seen sketch flavor only —
    the prefilter is rescued by the exact anti-join either way, so the
    crawl's fetch order must be byte-identical to the Bloom run."""
    cfg = CrawlConfig(
        delay_s=DELAY, parse=False, seen_filter="cuckoo", bloom_banks=2,
        **CFG,
    )
    alt = run_crawl(
        spark, world["pages"], world["seeds"], world["links"],
        world["robots"], cfg,
    )
    assert _engine_fetch_order(alt) == _engine_fetch_order(engine_run)
