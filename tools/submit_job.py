"""spark-submit entry point (north_rule: "run via spark-submit
--py-files on a multi-executor cluster").

Packaging + launch (tools/submit_demo.sh does exactly this):

    python -m zipfile -c /tmp/wcs_engine.zip wos_crawler_spark
    spark-submit --master local[8] \
        --py-files /tmp/wcs_engine.zip \
        tools/submit_job.py --n 50000 --waves 2

On a real cluster only --master/--deploy-mode change; the engine is a
pure-Python package with no native deps, so the same zip ships to any
executor. Prints one JSON line with wave metrics.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--waves", type=int, default=2)
    ap.add_argument("--delay", type=float, default=0.001)
    args = ap.parse_args()

    # spark-submit owns the session config (master, memory, py-files)
    spark = SparkSession.builder.appName("wcs-crawl-job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl

    cores = spark.sparkContext.defaultParallelism
    pages = pages_table(spark, args.n, partitions=cores * 2).persist()
    pages.count()
    res = run_crawl(
        spark,
        pages=pages,
        seeds=seeds_table(spark),
        links=links_table(spark, args.n, partitions=cores),
        robots=robots_table(spark),
        cfg=CrawlConfig(
            delay_s=args.delay, max_waves=args.waves, parse=False
        ),
    )
    print(json.dumps({"job": "crawl", "n": args.n, "metrics": res.metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
