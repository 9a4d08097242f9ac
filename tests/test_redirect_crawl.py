"""Redirect resolution wired into the crawl wave loop
(run_crawl(redirects=...) → resolve once → rewrite at every frontier
entry): full-crawl fetch-order + seen-set parity with the python
simulator, whose twin resolves chains by direct walking — an
independent restatement of the engine's path doubling. The planted
map has 1-hop chains, a 2-cycle, and a chain longer than the hop cap,
and the test asserts the redirects actually changed the crawl."""

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
HOPS = 3


def _edges() -> dict[str, str]:
    e = {}
    # 1-hop hops scattered over the id space (i+1 is never a source)
    for i in range(0, N, 10):
        e[wosgen.url_of(i)] = wosgen.url_of(i + 1)
    # 2-cycle: both refused
    e[wosgen.url_of(5)] = wosgen.url_of(15)
    e[wosgen.url_of(15)] = wosgen.url_of(5)
    # 4-hop chain under a 3-hop cap: head refused, tail resolves
    e[wosgen.url_of(7)] = wosgen.url_of(17)
    e[wosgen.url_of(17)] = wosgen.url_of(27)
    e[wosgen.url_of(27)] = wosgen.url_of(37)
    e[wosgen.url_of(37)] = wosgen.url_of(47)
    return e


def test_full_crawl_parity_with_simulator(spark):
    edges = _edges()
    edges_df = spark.createDataFrame(
        sorted(edges.items()), "src string, dst string"
    )
    cfg_common = dict(
        quota=5, max_waves=3, max_depth=2, max_retries=2,
        rows_per_bucket=8,
    )
    pages = pages_table(spark, N, partitions=4)
    links = links_table(spark, N)
    eng = run_crawl(
        spark, pages, seeds_table(spark), links, robots_table(spark),
        CrawlConfig(
            delay_s=1.0, parse=False, redirect_max_hops=HOPS,
            **cfg_common,
        ),
        redirects=edges_df,
    )

    urls = [wosgen.url_of(i) for i in range(N)]
    meta_rows = with_url_canon(
        spark.createDataFrame([(u,) for u in urls], "url string")
    ).collect()
    url_meta = {
        r["url"]: (r["url_canon"], r["url_hash"], r["host"])
        for r in meta_rows
    }
    page_texts = {
        r["url"]: r["text"]
        for r in pages.select("url", "text").collect()
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
    sim = simulate_crawl(
        redirect_edges=edges, redirect_max_hops=HOPS, **sim_kwargs
    )

    rows = eng.fetch_log.select(
        "wave", "url", "scheduled_ts", "host", "url_hash"
    ).collect()
    rows.sort(
        key=lambda r: (
            r["wave"], r["scheduled_ts"], r["host"], r["url_hash"]
        )
    )
    engine_order = [
        (r["wave"], r["url"], round(r["scheduled_ts"], 6)) for r in rows
    ]
    assert len(engine_order) > 10
    assert engine_order == sim.fetch_order
    assert {r["url_hash"] for r in eng.seen.collect()} == sim.seen

    fetched_urls = {u for (_, u, _) in engine_order}
    # refused sources never fetched (cycle members + over-cap head)
    for i in (5, 15, 7):
        assert wosgen.url_of(i) not in fetched_urls
    # the map actually bit: a redirect-free simulation differs
    plain = simulate_crawl(**sim_kwargs)
    assert plain.fetch_order != sim.fetch_order
    # ...and a redirect SOURCE it fetched proves the refusal/rewrite
    plain_urls = {u for (_, u, _) in plain.fetch_order}
    assert plain_urls & set(_edges())
