#!/bin/sh
# Demonstrates the north_rule's deployment path: package the engine,
# ship it with --py-files, run the crawl job under spark-submit.
set -e
cd "$(dirname "$0")/.."
python -m zipfile -c /tmp/wcs_engine.zip wos_crawler_spark
exec spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
    --conf spark.local.dir=/dev/shm/wcs-submit \
    --py-files /tmp/wcs_engine.zip \
    tools/submit_job.py "$@"
