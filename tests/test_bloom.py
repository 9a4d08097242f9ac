"""Bloom sketch properties (SURVEY §5.2-3; §7.3 'property-test it
standalone'): no false negatives, bounded fpp, merge = union,
serialization round-trip, false-positive rescue by the exact anti-join."""

import numpy as np

from wos_crawler_spark.operators.bloom import (
    BankedBloomFilter,
    BloomFilter,
    bloom_from_bytes,
    bloom_prefilter,
    build_banked_bloom,
    build_bloom,
)
from wos_crawler_spark.operators.dedup import dedup_frontier


def test_no_false_negatives():
    bf = BloomFilter.sized(10_000, 0.01)
    keys = np.arange(-5000, 5000, dtype=np.int64) * 2654435761
    bf.add(keys)
    assert bf.might_contain(keys).all()


def test_fpp_bounded():
    bf = BloomFilter.sized(10_000, 0.01)
    bf.add(np.arange(10_000, dtype=np.int64))
    probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fpp = bf.might_contain(probe).mean()
    assert fpp < 0.03  # 3x headroom over nominal 1%


def test_merge_is_union():
    a = BloomFilter.sized(1000, 0.01)
    b = BloomFilter.sized(1000, 0.01)
    ka = np.arange(0, 500, dtype=np.int64)
    kb = np.arange(500, 1000, dtype=np.int64)
    a.add(ka)
    b.add(kb)
    m = a.merge(b)
    assert m.might_contain(ka).all() and m.might_contain(kb).all()


def test_serialization_roundtrip():
    bf = BloomFilter.sized(1000, 0.01)
    bf.add(np.array([1, -7, 99], dtype=np.int64))
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert rt.n_hashes == bf.n_hashes and (rt.bits == bf.bits).all()
    assert rt.might_contain(np.array([1, -7, 99], dtype=np.int64)).all()


def test_distributed_build_equals_local(spark):
    keys = [(int(k),) for k in np.arange(2000, dtype=np.int64) * 7919]
    df = spark.createDataFrame(keys, "url_hash long").repartition(8)
    dist = build_bloom(df, "url_hash", capacity=2000, fpp=0.01)
    local = BloomFilter.sized(2000, 0.01)
    local.add(np.array([k[0] for k in keys], dtype=np.int64))
    assert (dist.bits == local.bits).all()


def test_prefilter_drops_seen(spark):
    bf = BloomFilter.sized(100, 0.01)
    bf.add(np.array([10, 20], dtype=np.int64))
    df = spark.createDataFrame([(10,), (20,), (30,)], "url_hash long")
    kept = bloom_prefilter(df, bf).collect()
    assert {r["url_hash"] for r in kept} == {30}


# ---------------------------------------------------- banked sharding


def _spread_keys(n):
    """Keys whose TOP bits vary (bank routing uses the top log2 B bits)."""
    with np.errstate(over="ignore"):
        u = np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return u.view(np.int64)


def test_banked_no_false_negatives_and_fpp():
    bb = BankedBloomFilter.sized(40_000, 0.01, n_banks=4)
    keys = _spread_keys(40_000)
    bb.add(keys)
    assert bb.might_contain(keys).all()
    probe = _spread_keys(140_000)[40_000:]
    assert bb.might_contain(probe).mean() < 0.03
    # all four banks actually used (top-bit routing spreads keys)
    assert all(b.bits.any() for b in bb.banks)


def test_banked_cross_merge_is_union():
    a = BankedBloomFilter.sized(4000, 0.01, n_banks=8)
    b = BankedBloomFilter.sized(4000, 0.01, n_banks=8)
    ka, kb = _spread_keys(4000)[:2000], _spread_keys(4000)[2000:]
    a.add(ka)
    b.add(kb)
    m = a.merge(b)
    assert m.might_contain(ka).all() and m.might_contain(kb).all()


def test_banked_serialization_roundtrip_and_dispatch():
    bb = BankedBloomFilter.sized(1000, 0.01, n_banks=4)
    keys = _spread_keys(500)
    bb.add(keys)
    rt = bloom_from_bytes(bb.to_bytes())
    assert isinstance(rt, BankedBloomFilter) and rt.n_banks == 4
    assert rt.might_contain(keys).all()
    mono = BloomFilter.sized(1000, 0.01)
    mono.add(keys)
    rt2 = bloom_from_bytes(mono.to_bytes())
    assert isinstance(rt2, BloomFilter)
    assert rt2.might_contain(keys).all()


def test_banked_distributed_build_equals_local(spark):
    keys = _spread_keys(3000)
    df = spark.createDataFrame(
        [(int(k),) for k in keys], "url_hash long"
    ).repartition(8)
    dist = build_banked_bloom(df, "url_hash", capacity=3000, fpp=0.01, n_banks=4)
    local = BankedBloomFilter.sized(3000, 0.01, n_banks=4)
    local.add(keys)
    for db, lb in zip(dist.banks, local.banks):
        assert (db.bits == lb.bits).all()


def test_crawl_banked_bloom_identical_to_monolithic(spark):
    """B=4 vs B=1 must produce the SAME fetch log and seen set — the
    Bloom is a prefilter; banking only changes its layout."""
    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl

    n = 200
    logs = {}
    for banks in (1, 4):
        res = run_crawl(
            spark,
            pages=pages_table(spark, n, partitions=8),
            seeds=seeds_table(spark),
            links=links_table(spark, n, partitions=8),
            robots=robots_table(spark),
            cfg=CrawlConfig(
                delay_s=0.1, max_waves=3, parse=False,
                bloom_banks=banks, bloom_prefilter=True,
            ),
        )
        logs[banks] = (
            sorted(
                (r["wave"], r["url"], r["scheduled_ts"])
                for r in res.fetch_log.collect()
            ),
            sorted(r["url_hash"] for r in res.seen.collect()),
        )
    assert logs[1] == logs[4]


def test_merge_rejects_flavor_and_shape_mismatch():
    import pytest

    mono = BloomFilter.sized(1000, 0.01)
    banked = BankedBloomFilter.sized(1000, 0.01, n_banks=4)
    with pytest.raises(ValueError, match="different flavor/shape"):
        mono.merge(banked)
    with pytest.raises(ValueError, match="different flavor/shape"):
        banked.merge(BankedBloomFilter.sized(1000, 0.01, n_banks=8))
    with pytest.raises(ValueError, match="different flavor/shape"):
        mono.merge(BloomFilter.sized(5000, 0.01))


def test_crawl_resume_adopts_checkpointed_bloom_flavor(spark, tmp_path):
    """Resuming a banked-Bloom checkpoint with a cfg that says banks=1
    must keep the checkpoint's flavor (and vice versa) instead of
    crashing in merge; an incompatible capacity is a clear error."""
    import pytest

    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl

    n = 120
    world = dict(
        pages=pages_table(spark, n, partitions=4),
        seeds=seeds_table(spark),
        links=links_table(spark, n),
        robots=robots_table(spark),
    )
    d = str(tmp_path / "ck")
    run_crawl(
        spark, **world,
        cfg=CrawlConfig(delay_s=1.0, max_waves=1, parse=False,
                        bloom_banks=4, ckpt_dir=d),
    )
    # flavor disagreement: cfg says 1 bank — checkpoint's 4 win, no crash
    res = run_crawl(
        spark, **world,
        cfg=CrawlConfig(delay_s=1.0, max_waves=2, parse=False,
                        bloom_banks=1, ckpt_dir=d),
        resume=True,
    )
    assert res.waves and res.waves[0].wave == 1
    # incompatible shape (capacity change) → clear error, not
    # corruption. Fresh checkpoint dir so the resumed wave still has
    # frontier work (an empty frontier would never touch the filter).
    d2 = str(tmp_path / "ck2")
    run_crawl(
        spark, **world,
        cfg=CrawlConfig(delay_s=1.0, max_waves=1, parse=False,
                        bloom_banks=4, ckpt_dir=d2),
    )
    with pytest.raises(ValueError, match="incompatible"):
        run_crawl(
            spark, **world,
            cfg=CrawlConfig(delay_s=1.0, max_waves=2, parse=False,
                            bloom_banks=4, bloom_capacity=50_000,
                            ckpt_dir=d2),
            resume=True,
        )


def test_false_positive_rescued_by_exact_antijoin(spark):
    """A Bloom false positive must still survive dedup thanks to the
    exact anti-join (correctness never depends on the Bloom)."""
    # tiny bloom → huge fpp: force false positives
    bf = BloomFilter(bits=np.zeros(8, dtype=np.uint8), n_hashes=2)
    seen_keys = np.arange(0, 40, dtype=np.int64)
    bf.add(seen_keys)
    probe = np.arange(1000, 1200, dtype=np.int64)
    fp = probe[BloomFilter.from_bytes(bf.to_bytes()).might_contain(probe)]
    assert len(fp) > 0, "test needs at least one false positive"

    cand = spark.createDataFrame(
        [(int(k), 1, 0, f"l{k}") for k in probe],
        "url_hash long, priority int, query_id long, lineage string",
    )
    seen = spark.createDataFrame([(int(k),) for k in seen_keys], "url_hash long")
    out = {r["url_hash"] for r in dedup_frontier(cand, seen, bf).collect()}
    assert out == set(int(x) for x in probe)  # nothing lost, incl. FPs
