"""Bucketed-table storage for the crawl's two big join sides.

``prepare_fetch_side`` / ``prepare_links_side`` (plans/crawl.py) lay
the fetch/expansion join sides out at RUNTIME: repartition on the join
key, sort within partitions, cache. Correct — but the exchange and the
cache are paid once per crawl, and the cache occupies executor storage
for the crawl's lifetime. At production scale the layout should be a
property of STORAGE instead: the pages table lives bucketed by ``url``
and the links table by ``src_url``, so every crawl (and every other
consumer of these tables) reads pre-partitioned data and the per-wave
fetch join shuffles ONLY the small scheduled side — zero layout work,
zero pinned cache.

This module is the executable form of that contract on Spark's
built-in bucketed parquet tables (``df.write.bucketBy(N, key)
.sortBy(key).saveAsTable(...)``, SPARK-ANALOG of Hive bucketing):
the bucketed ``FileSourceScanExec`` reports
``HashPartitioning(key, n_buckets)``, so ``EnsureRequirements`` plans
the join with an Exchange on the probe side only — verified by
tests/test_bucketed.py, which counts Exchange nodes in the executed
plan and pins fetch-order parity of a full crawl run over bucketed
sides vs the default runtime layout.

The Iceberg twin of this layout is the ``bucket(N, url)`` /
``bucket(N, src_url)`` partition-spec DDL in sources/iceberg.py —
same one-sided-exchange property via storage-partitioned joins
(``spark.sql.sources.v2.bucketing.enabled``), plus snapshot isolation
and compaction. Where Iceberg jars are absent (this sandbox), Spark
bucketed tables demonstrate the identical plan shape end-to-end.

Operational notes encoded here rather than left to callers:

* Bucket count is a read-time contract too: joins against a bucketed
  table repartition the probe side to ``n_buckets`` tasks, so pick a
  bucket count that is a healthy task count for the deployment (rule
  of thumb: >= the session's shuffle partitions; at 100 TB, hundreds
  to low thousands).
* Bucketed scans are planned only through the session catalog
  (``spark.table(name)``) — ``spark.read.parquet(path)`` on the same
  files loses the bucket metadata and with it the partitioning.
* ``sortBy`` makes each bucket FILE sorted; Spark only exploits the
  ordering (sort-free SMJ) when a bucket holds a single file, so the
  writer coalesces small inputs. Layout cost is one shuffle — the
  same shuffle ``prepare_*_side`` pays per crawl, paid once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed",
    "write_pages_bucketed",
    "write_links_bucketed",
    "fetch_side_from_table",
    "links_side_from_table",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """One-time layout job: persist ``df`` as a parquet table bucketed
    (and bucket-file-sorted) by ``key``. With ``path`` the table is
    external (data at ``path``, metadata in the session catalog);
    without, it lands under ``spark.sql.warehouse.dir``."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_pages_bucketed(
    pages: DataFrame, table: str, n_buckets: int, path: str | None = None
) -> None:
    """pages bucketed by ``url`` — the J3 fetch-join layout."""
    write_bucketed(pages, table, "url", n_buckets, path=path)


def write_links_bucketed(
    links: DataFrame, table: str, n_buckets: int, path: str | None = None
) -> None:
    """links bucketed by ``src_url`` — the expansion-join layout."""
    write_bucketed(links, table, "src_url", n_buckets, path=path)


def fetch_side_from_table(
    spark: SparkSession, table: str, with_text: bool = False
) -> DataFrame:
    """J3 fetch side read straight off a bucketed pages table: the
    drop-in twin of ``prepare_fetch_side`` with no repartition and no
    cache — the scan itself carries ``HashPartitioning(url)``. Pass
    the result as ``run_crawl(pages_fetch=...)``.

    Same projection contract as prepare_fetch_side: ``_page_hit`` is
    the always-non-null hit/miss probe for the left join (a data
    column would miscount legitimately-null values as misses), and
    ``with_text=False`` prunes the heavy payload column at the scan
    (schedule-throughput runs never shuffle page bytes)."""
    cols = ["url", "text", "lang", "warc_ts"] if with_text else [
        "url", "lang", "warc_ts"
    ]
    return spark.table(table).select(*cols, F.lit(True).alias("_page_hit"))


def links_side_from_table(spark: SparkSession, table: str) -> DataFrame:
    """Expansion-join side off a bucketed links table; the drop-in
    twin of ``prepare_links_side`` (``run_crawl(links_prepped=...)``)."""
    return spark.table(table).select("src_url", "dst_url")
