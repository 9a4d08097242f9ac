"""Structured-Streaming surface (SURVEY.md §2.7 — optional post-v1
capability map; the reference's loop is batch-iterative, its Twisted
async IO is concurrency, not a streaming data model).

Implemented streaming mappings:
- tumbling-window ingest stats over a pages stream (per-wave batching
  analog): windowed count/bytes per lang with a watermark for late
  ``warc_ts`` arrivals (retry-TTL analog F7/F8);
- a stateful per-host fetch-gap monitor via
  ``applyInPandasWithState`` (downloader-slot analog) is deliberately
  NOT shipped in v1 — state lives in checkpointed tables (SURVEY §2.7
  note) — but the windowed path exercises watermarks + incremental
  aggregation end-to-end.

Batch-driven smoke usage (tests): parquet source dir → memory sink →
``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wos_crawler_spark.fixtures.synth import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of pages parquet (one file per micro-batch
    at most — the Common-Crawl dump-ingest analog)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def windowed_ingest_stats(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window ingest metrics per lang: rows + text bytes.
    Watermark bounds state for late pages (late data dropped after
    ``watermark`` — the retry-TTL analog)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("text")).alias("text_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "text_bytes",
        )
    )


def run_stream_to_memory(
    agg: DataFrame, query_name: str, mode: str = "update"
) -> "object":
    """Start the stream into an in-memory sink; caller runs
    ``q.processAllAvailable()`` then reads ``spark.sql(f"select *
    from {query_name}")`` (local smoke-test harness)."""
    return (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
