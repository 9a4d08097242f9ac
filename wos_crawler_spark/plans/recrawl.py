"""Recrawl / eviction plan (north_rule: "bloom/cuckoo URL-seen" — this
is the cuckoo flavor's reason to exist).

Reference behavior: the reference crawler has no recrawl story — its
dupefilter set only ever GROWS, so re-exporting an updated record
means wiping ``requests.seen`` and starting over. A production crawl
over Common-Crawl-style pages needs the opposite: expire stale pages
(fetched before some cutoff) so the next waves re-fetch exactly those,
without rebuilding the whole seen sketch or re-admitting anything
else.

Plan shape (all DataFrame ops, nothing driver-scale except the filter
blobs the probe path already ships):

1. ``stale_pages`` — the expiry predicate as a pushed-down scan filter
   plus a semi join against the checkpointed seen set (only URLs the
   crawl actually fetched can expire).
2. ``evict_for_recrawl`` — commits an EVICTION WAVE to the checkpoint:
   * seen: expired keys recorded in ``seen_evict/`` (CDC-merged by
     ``checkpoint.read_seen``; the production twin is an Iceberg
     MERGE DELETE on the seen table),
   * sketch: cuckoo flavor deletes the keys in place, distributed
     per shard (``operators/cuckoo.evict_sharded_cuckoo``); Bloom
     flavor cannot delete, so it REBUILDS from the surviving seen set
     (one distributed banked build — the cost the cuckoo flavor
     avoids),
   * frontier: the expired URLs re-enter the frontier with
     ``lineage='recrawl:<reason>'`` and depth 0.
3. ``run_crawl(resume=True)`` then re-fetches exactly the evicted
   URLs through the normal robots/politeness/dedup machinery — no
   special-case branch in the wave loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wos_crawler_spark.functions.urlnorm import with_url_canon
from wos_crawler_spark.operators import checkpoint as ckpt
from wos_crawler_spark.operators.bloom import (
    BankedBloomFilter,
    BloomFilter,
    bloom_from_bytes,
    build_banked_bloom,
    build_bloom,
)
from wos_crawler_spark.operators.cuckoo import (
    CuckooFilter,
    ShardedCuckooFilter,
    evict_sharded_cuckoo,
)
from wos_crawler_spark.plans.crawl import FRONTIER_COLS, CrawlConfig


def stale_pages(pages: DataFrame, seen: DataFrame, cutoff_ts) -> DataFrame:
    """URLs eligible for recrawl: fetched pages whose ``warc_ts`` is
    before ``cutoff_ts``. The timestamp predicate pushes into the
    pages scan (only url/warc_ts read); the semi join restricts to
    the checkpointed seen set — the filter-deletion contract."""
    p = with_url_canon(
        pages.filter(F.col("warc_ts") < F.lit(cutoff_ts)).select(
            "url", "warc_ts"
        )
    )
    return p.join(
        seen.select("url_hash").hint("shuffle_hash"), "url_hash", "left_semi"
    ).select("url", "url_canon", "url_hash", "host")


def evict_for_recrawl(
    spark: SparkSession,
    ckpt_dir: str,
    expired: DataFrame,
    cfg: CrawlConfig,
    priority: int = 0,
    reason: str = "expired",
) -> dict:
    """Commit an eviction wave: expired URLs leave the seen set (CDC
    delete record + sketch update) and re-enter the frontier. Returns
    the wave's metrics dict. ``expired`` needs a ``url`` column; rows
    not in the checkpointed seen set are ignored (deleting a
    never-inserted key from a cuckoo filter could evict a colliding
    fingerprint — the semi join enforces the contract)."""
    last = ckpt.latest_wave(ckpt_dir)
    if last is None:
        raise ValueError(f"no committed wave to evict from in {ckpt_dir}")
    seen = ckpt.read_seen(spark, ckpt_dir, last)
    filt = bloom_from_bytes(ckpt.read_bloom_bytes(ckpt_dir, last))
    wave = last + 1

    from pyspark.sql.window import Window

    exp = (
        with_url_canon(expired.select("url"))
        .select("url", "url_canon", "url_hash", "host")
        # deterministic survivor per hash (dropDuplicates would pick
        # whichever partition answers first — the readmitted frontier
        # row's url spelling must not depend on partitioning)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url_hash").orderBy("url")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .join(seen.select("url_hash"), "url_hash", "left_semi")
        .localCheckpoint()  # one materialization: counted, evicted,
        # re-admitted and written below
    )
    n_evict = exp.count()

    if n_evict:
        keys = exp.select("url_hash")
        if isinstance(filt, ShardedCuckooFilter):
            filt = evict_sharded_cuckoo(filt, keys)
        elif isinstance(filt, CuckooFilter):
            filt = evict_sharded_cuckoo(ShardedCuckooFilter([filt]), keys).shards[0]
        else:
            # Bloom flavors: no deletion — rebuild from the surviving
            # seen set at the SAME shape (a full distributed build;
            # the cuckoo flavor's delete is O(evicted) instead).
            survivors = seen.join(keys, "url_hash", "left_anti")
            if isinstance(filt, BankedBloomFilter):
                rebuilt = build_banked_bloom(
                    survivors, "url_hash", cfg.bloom_capacity,
                    cfg.bloom_fpp, filt.shape[0],
                )
            else:
                assert isinstance(filt, BloomFilter)
                rebuilt = build_bloom(
                    survivors, "url_hash", cfg.bloom_capacity, cfg.bloom_fpp
                )
            if rebuilt.shape != filt.shape:
                raise ValueError(
                    f"rebuilt Bloom shape {rebuilt.shape} != checkpointed "
                    f"{filt.shape}; evict with the original filter config"
                )
            filt = rebuilt

    readmit = (
        exp.withColumn("priority", F.lit(priority))
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_wave", F.lit(wave))
        .withColumn("attempt", F.lit(0))
        .withColumn("query_id", F.lit(-1).cast("long"))
        .withColumn("dont_filter", F.lit(False))
        .withColumn("lineage", F.lit(f"recrawl:{reason}"))
        .select(FRONTIER_COLS)
    )
    frontier = ckpt.read_frontier(spark, ckpt_dir, last).unionByName(readmit)
    evicted_keys = exp.select("url_hash").withColumn("wave", F.lit(wave))
    metrics = {
        "wave": wave,
        "eviction": True,
        "evicted": n_evict,
        "readmitted": n_evict,
        "reason": reason,
        "next_start_ts": ckpt.read_metrics(ckpt_dir, last)["next_start_ts"],
    }
    ckpt.commit_eviction(
        ckpt_dir, wave, frontier, evicted_keys, filt.to_bytes(), metrics
    )
    return metrics
