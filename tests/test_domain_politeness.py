"""eTLD+1 politeness keying (CrawlConfig.politeness_domain):
full-crawl fetch-order AND seen-set parity vs the simulator with the
scheduling unit rewritten to the registrable domain, plus proof the
knob bites (the fixture's h*.example.org subdomain farm collapses
into ONE example.org token bucket) and the true host surviving into
the fetch log; backoff composes domain-keyed."""

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
from wos_crawler_spark.operators.blocklist import registrable_domain
from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from wos_crawler_spark.plans.simulator import simulate_crawl

N = 160
CFG = dict(quota=5, max_waves=3, max_depth=2, max_retries=2,
           rows_per_bucket=8)


def test_full_crawl_parity_domain_keyed(spark):
    pages = pages_table(spark, N, partitions=4)
    seeds, robots, links = (
        seeds_table(spark), robots_table(spark), links_table(spark, N)
    )
    eng = run_crawl(
        spark, pages, seeds, links, robots,
        CrawlConfig(
            delay_s=1.0, parse=False, politeness_domain=True, **CFG
        ),
    )

    urls = [wosgen.url_of(i) for i in range(N)]
    meta_rows = with_url_canon(
        spark.createDataFrame([(u,) for u in urls], "url string")
    ).collect()
    url_meta = {
        r["url"]: (r["url_canon"], r["url_hash"], r["host"])
        for r in meta_rows
    }
    hosts = sorted({h for _, _, h in url_meta.values()})
    dmap = {
        r.host: r.dom
        for r in spark.createDataFrame([(h,) for h in hosts], "host string")
        .select(
            "host",
            F.coalesce(
                registrable_domain(F.col("host")), F.col("host")
            ).alias("dom"),
        )
        .collect()
    }
    # the fixture subdomain farm really collapses
    assert len(set(dmap.values())) < len(dmap)

    page_texts = {
        r["url"]: r["text"] for r in pages.select("url", "text").collect()
    }
    links_map = {}
    for r in links.collect():
        links_map.setdefault(r["src_url"], []).append(r["dst_url"])
    robots_map = {}
    for r in robots.collect():
        robots_map.setdefault(r["host"], []).append(
            (r["rule_prefix"], r["allow"], r["rule_len"])
        )
    seed_list = [
        (r["query_id"], r["term"], r["priority"]) for r in seeds.collect()
    ]
    sim_kwargs = dict(
        pages_urls=set(page_texts), page_texts=page_texts,
        seeds=seed_list, links=links_map, robots=robots_map,
        url_meta=url_meta, delay_s=1.0, **CFG,
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

    # fetch log carries the TRUE host, not the scheduling domain
    log_hosts = {r["host"] for r in rows}
    assert any(h not in set(dmap.values()) for h in log_hosts)

    # and the knob bites: host-keyed scheduling produces a different
    # order (the farm no longer shares one token bucket)
    plain = simulate_crawl(**sim_kwargs)
    assert plain.fetch_order != sim.fetch_order


def test_backoff_composes_domain_keyed(spark):
    """politeness_domain + backoff: stats/delays/quarantine key on the
    registrable domain — misses on a.deadfarm.net and b.deadfarm.net
    accumulate as ONE registrant and quarantine cuts BOTH subdomains.
    Full fetch-order + seen-set parity vs the simulator."""
    n = 160
    bo_kw = dict(min_fetches=3, err_pct=25, factor=3, quarantine_pct=90)
    pages = pages_table(spark, n, partitions=4)
    dead = []
    for i in range(0, n, 2):
        sub = "a" if i % 4 == 0 else "b"
        dead.append(
            (wosgen.url_of(i), f"https://{sub}.deadfarm.net/p{i}")
        )
    links = links_table(spark, n).unionByName(
        spark.createDataFrame(dead, "src_url string, dst_url string")
    )
    seeds, robots = seeds_table(spark), robots_table(spark)
    eng = run_crawl(
        spark, pages, seeds, links, robots,
        CrawlConfig(
            delay_s=1.0, parse=False, politeness_domain=True,
            backoff=True, backoff_kwargs=bo_kw, max_waves=4,
            max_depth=3, quota=5, max_retries=2, rows_per_bucket=8,
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
    hosts = sorted({h for _, _, h in url_meta.values()})
    dmap = {
        r.host: r.dom
        for r in spark.createDataFrame([(h,) for h in hosts], "host string")
        .select(
            "host",
            F.coalesce(
                registrable_domain(F.col("host")), F.col("host")
            ).alias("dom"),
        )
        .collect()
    }
    assert dmap["a.deadfarm.net"] == dmap["b.deadfarm.net"] == "deadfarm.net"

    page_texts = {
        r["url"]: r["text"] for r in pages.select("url", "text").collect()
    }
    links_map = {}
    for r in links.collect():
        links_map.setdefault(r["src_url"], []).append(r["dst_url"])
    robots_map = {}
    for r in robots.collect():
        robots_map.setdefault(r["host"], []).append(
            (r["rule_prefix"], r["allow"], r["rule_len"])
        )
    seed_list = [
        (r["query_id"], r["term"], r["priority"]) for r in seeds.collect()
    ]
    sim = simulate_crawl(
        pages_urls=set(page_texts), page_texts=page_texts,
        seeds=seed_list, links=links_map, robots=robots_map,
        url_meta=url_meta, delay_s=1.0,
        politeness_domain=True, domain_map=dmap,
        backoff=True, backoff_kwargs=bo_kw,
        max_waves=4, max_depth=3, quota=5, max_retries=2,
        rows_per_bucket=8,
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
    # both subdomains quarantined together: no deadfarm fetch in the
    # final wave despite fresh links flowing
    dead_waves = [w for w, u, _ in engine_order if "deadfarm.net" in u]
    assert dead_waves
    assert max(dead_waves) < max(w for w, _, _ in engine_order)
