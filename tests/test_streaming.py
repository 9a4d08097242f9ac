"""Structured-Streaming surface: windowed ingest stats over a pages
stream equal the equivalent batch aggregation (SURVEY §2.7)."""

from wos_crawler_spark.fixtures.synth import pages_table
from wos_crawler_spark.streaming.ingest import (
    read_pages_stream,
    run_stream_to_memory,
    windowed_ingest_stats,
)
from pyspark.sql import functions as F


def test_windowed_ingest_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    pages = pages_table(spark, 400, partitions=4)
    pages.write.mode("overwrite").parquet(src)

    stream = read_pages_stream(spark, src)
    agg = windowed_ingest_stats(stream, window="1 hour", watermark="2 hours")
    q = run_stream_to_memory(agg, "ingest_stats", mode="update")
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["lang"]): (r["n_pages"], r["text_bytes"])
            for r in spark.sql("select * from ingest_stats").collect()
        }
    finally:
        q.stop()

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("b"))
        .collect()
    )
    expect = {(r["w"]["start"], r["lang"]): (r["n"], r["b"]) for r in batch}
    assert got == expect and len(got) > 0
