"""Bucketed-table storage layout (sources/bucketed.py): the stored
side of the fetch/expansion joins must arrive pre-partitioned from
storage (one Exchange total, on the probe side), and a full crawl over
bucketed sides must be byte-identical to the runtime-layout crawl."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.fixtures.synth import (
    links_table,
    pages_table,
    robots_table,
    seeds_table,
)
from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from wos_crawler_spark.sources.bucketed import (
    fetch_side_from_table,
    links_side_from_table,
    write_links_bucketed,
    write_pages_bucketed,
)

N = 200
CFG = dict(
    delay_s=1.0, parse=False, quota=5, max_waves=3, max_depth=2,
    max_retries=2, rows_per_bucket=8,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    write_pages_bucketed(
        pages_table(spark, N, partitions=4), "bt_pages", 8,
        path=str(root / "pages"),
    )
    write_links_bucketed(
        links_table(spark, N), "bt_links", 8, path=str(root / "links"),
    )
    yield {"pages_path": str(root / "pages")}
    spark.sql("DROP TABLE IF EXISTS bt_pages")
    spark.sql("DROP TABLE IF EXISTS bt_links")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _probe_frontier(spark):
    """A frontier-shaped probe side (url + payload) with no layout."""
    return pages_table(spark, N, partitions=4).select(
        "url", F.lit(7).alias("priority")
    )


def test_fetch_join_shuffles_probe_side_only(spark, bucketed_tables):
    """The J3-shaped left join against the bucketed pages table plans
    exactly ONE Exchange — on the probe side. The same join against a
    raw-path read of the very same parquet files (bucket metadata
    lost) pays two."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fetch = fetch_side_from_table(spark, "bt_pages", with_text=False)
        joined = _probe_frontier(spark).join(fetch, "url", "left")
        plan = _plan(joined)
        assert plan.count("Exchange") == 1, plan
        assert "Bucketed: true" in plan, plan

        raw = (
            spark.read.parquet(bucketed_tables["pages_path"])
            .select("url", "lang", "warc_ts", F.lit(True).alias("_page_hit"))
        )
        raw_joined = _probe_frontier(spark).join(raw, "url", "left")
        assert _plan(raw_joined).count("Exchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_links_join_shuffles_probe_side_only(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        links = links_side_from_table(spark, "bt_links")
        hits = pages_table(spark, N, partitions=4).select(
            F.col("url").alias("src_url")
        )
        plan = _plan(hits.join(links, "src_url", "inner"))
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_crawl_over_bucketed_sides_identical_output(spark, bucketed_tables):
    """Storage layout is a pure physical property: run_crawl fed the
    bucketed tables (no runtime repartition, no join-side cache) must
    produce the identical fetch log as the default layout."""
    pages = pages_table(spark, N, partitions=4)
    seeds, robots = seeds_table(spark), robots_table(spark)
    links = links_table(spark, N)
    cfg = CrawlConfig(**CFG)

    base = run_crawl(spark, pages, seeds, links, robots, cfg)
    alt = run_crawl(
        spark, pages, seeds, links, robots, cfg,
        pages_fetch=fetch_side_from_table(spark, "bt_pages", with_text=False),
        links_prepped=links_side_from_table(spark, "bt_links"),
    )

    def order(res):
        return sorted(
            (r["wave"], r["url"], r["scheduled_ts"])
            for r in res.fetch_log.select(
                "wave", "url", "scheduled_ts"
            ).collect()
        )

    assert order(alt) == order(base)
    assert order(base)  # non-vacuous


def test_write_bucketed_rejects_bad_bucket_count(spark):
    from wos_crawler_spark.sources.bucketed import write_bucketed

    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(pages_table(spark, 10), "bt_bad", "url", 0)
