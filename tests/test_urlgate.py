"""URL-level quality gate (operators/urlgate.py): per-rule trips,
feature extraction edges, digit-ratio integer boundary, banned
substring counting, NULL totality, partitioning invariance."""

from pyspark.sql import functions as F

from wos_crawler_spark.operators.urlgate import (
    url_features,
    url_quality_gate,
)


def _gate(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"]: r for r in url_quality_gate(df, **kw).collect()}


def test_each_rule_trips_individually(spark):
    long_url = "https://a.com/" + "x" * 3000
    deep = "https://a.com/" + "/".join(f"s{i}" for i in range(20))
    query = "https://a.com/p?" + "&".join(f"k{i}=v" for i in range(12))
    digits = "https://a.com/2024/01/02/0123456789/9876543210"
    asset = "https://a.com/theme/style.CSS"
    banned = "https://a.com/free-casino-poker"
    good = "https://a.com/articles/science/quantum-entanglement.html"
    out = _gate(
        spark,
        [long_url, deep, query, digits, asset, banned, good],
        banned_words=["casino", "poker"],
    )
    assert not out[long_url]["url_ok_len"] and not out[long_url]["url_keep"]
    assert not out[deep]["url_ok_depth"]
    assert not out[query]["url_ok_query"]
    assert not out[digits]["url_ok_digits"]
    assert not out[asset]["url_ok_ext"]  # case-insensitive extension
    assert out[banned]["url_n_banned"] == 2 and not out[banned]["url_keep"]
    g = out[good]
    assert g["url_keep"] and all(
        g[c]
        for c in ["url_ok_len", "url_ok_depth", "url_ok_query",
                  "url_ok_digits", "url_ok_ext"]
    )
    # html is not a blocked extension
    assert g["url_ok_ext"]


def test_digit_ratio_integer_boundary_and_features(spark):
    # path '/12345/abc' → 5 digits / 10 chars: 5*2 <= 10*1 passes AT
    # the boundary; '/123456/ab' → 6/10: 6*2 > 10 fails — exactly the
    # integer cross-multiply, no float epsilon anywhere
    ok = "https://a.com/12345/abc"
    bad = "https://a.com/123456/ab"
    out = _gate(spark, [ok, bad])
    assert out[ok]["url_ok_digits"] and not out[bad]["url_ok_digits"]
    df = spark.createDataFrame(
        [("https://a.com/a/b/c.tar.gz?x=1&y=2#frag",)], "url string"
    )
    f = df.select(url_features(F.col("url")).alias("f")).first()["f"]
    assert f["path_depth"] == 3
    assert f["ext"] == "gz"  # last dot segment
    assert f["n_query_params"] == 2  # fragment not counted
    # extension only from the LEAF: dots in directories don't count
    f2 = (
        spark.createDataFrame([("https://a.com/v1.2/page",)], "url string")
        .select(url_features(F.col("url")).alias("f"))
        .first()["f"]
    )
    assert f2["ext"] == ""


def test_null_url_fails_totally_and_invariance(spark):
    df = spark.createDataFrame(
        [(None,), ("https://a.com/ok",)], "url string"
    )
    rows = {r["url"]: r for r in url_quality_gate(df).collect()}
    nrow = rows[None]
    assert nrow["url_keep"] is False and nrow["url_ok_len"] is False
    a = sorted(
        map(tuple, url_quality_gate(df.repartition(1)).collect()),
        key=str,
    )
    b = sorted(
        map(tuple, url_quality_gate(df.repartition(5)).collect()),
        key=str,
    )
    assert a == b


def test_full_crawl_parity_with_simulator_under_url_gate(spark):
    """CrawlConfig.url_gate wired through the wave loop: fetch-order
    AND seen-set equality vs the python simulator under an active
    gate. Poisoned link targets (.png assets + a banned word) enter
    the frontier via normal expansion and must be culled identically
    by url_keep_expr (engine) and url_gate_python (simulator). The
    digit rule is neutralized via url_gate_kwargs because the synth
    corpus's /rec/00000042 paths are digit-heavy by design — the
    kwargs plumb to BOTH gates, which is itself under test."""
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
    gate_kw = {
        "max_digit_num": 1, "max_digit_den": 1,
        "banned_words": ["casino"],
    }
    cfg_common = dict(
        quota=5, max_waves=3, max_depth=2, max_retries=2,
        rows_per_bucket=8,
    )
    pages = pages_table(spark, n, partitions=4)
    poison = []
    for i in range(0, n, 3):
        h = wosgen.host_of(i)
        poison.append((wosgen.url_of(i), f"https://{h}/img/banner{i}.png"))
        poison.append((wosgen.url_of(i), f"https://{h}/casino/promo{i}"))
    links = links_table(spark, n).unionByName(
        spark.createDataFrame(poison, "src_url string, dst_url string")
    )
    eng = run_crawl(
        spark, pages, seeds_table(spark), links, robots_table(spark),
        CrawlConfig(
            delay_s=1.0, parse=False, url_gate=True,
            url_gate_kwargs=gate_kw, **cfg_common,
        ),
    )
    urls = [wosgen.url_of(i) for i in range(n)] + [d for _, d in poison]
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
    sim = simulate_crawl(
        url_gate=True, url_gate_kwargs=gate_kw, **sim_kwargs
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
    # no gated url was ever fetched
    fetched_urls = {u for _, u, _ in engine_order}
    assert not any(
        ".png" in u or "casino" in u for u in fetched_urls
    )
    # the gate actually bit: an ungated run fetches strictly more
    ungated = simulate_crawl(**sim_kwargs)
    assert len(ungated.fetch_order) > len(sim.fetch_order)
    assert any("casino" in u for _, u, _ in ungated.fetch_order)
