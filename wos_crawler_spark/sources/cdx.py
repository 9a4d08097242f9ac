"""CDXJ index source — the third leg of the Common-Crawl ingest trio
(WET = text conversions, WARC = raw responses, CDX = the INDEX over
them). A CC index shard is line-oriented:

    <urlkey (SURT)> <timestamp yyyyMMddHHmmss> <JSON blob>

with the JSON carrying ``url``, ``status``, ``mime``, ``digest``,
``filename``/``offset``/``length`` (the WARC member coordinates).
Production pipelines seed frontiers and pick fetch subsets FROM THE
INDEX — grepping 10^11 index lines is cheap; touching the WARCs is
not — so this source turns index shards into the engine's frontier /
pages-metadata shape without ever opening an archive.

Spark-first shape: ``spark.read.text`` (splittable, line-parallel —
unlike the binaryFile WARC path, CDX parallelism is NOT capped at
file count), one codegen'd projection: two ``substring_index``-style
splits for urlkey/timestamp + ``from_json`` for the blob. Malformed
lines (missing fields, broken JSON) yield NULL fields rather than
killing a task — ``from_json`` is null-on-error by contract, and the
caller filters on ``url IS NOT NULL``.

The SURT urlkey is parsed but NOT re-derived from the url (real CDX
files are sorted by it; deriving SURT is canonicalization's job —
``functions/urlnorm`` — not the reader's).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: JSON blob schema — the stable CC-index core; extra keys are ignored
#: by from_json, absent keys are NULL.
CDX_JSON_SCHEMA = (
    "url string, status string, mime string, digest string, "
    "filename string, offset string, length string"
)


def parse_cdxj_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """``(urlkey, fetch_ts, url, status, mime, digest, filename,
    offset, length)`` from raw CDXJ lines. The first two
    space-delimited tokens are urlkey and timestamp; everything after
    the second space is the JSON blob (JSON itself contains spaces —
    splitting the whole line on spaces is the classic CDX bug, so the
    blob is taken by position: ``substr`` past the two tokens)."""
    v = F.col(value_col)
    # F.get, not getItem: a short line (fewer than 3 tokens) must
    # yield NULL fields, not an ANSI INVALID_ARRAY_INDEX task kill
    parts = F.split(v, " ", 3)
    urlkey = F.get(parts, 0)
    ts = F.get(parts, 1)
    blob = F.get(parts, 2)
    j = F.from_json(blob, CDX_JSON_SCHEMA)
    return lines.select(
        urlkey.alias("urlkey"),
        F.try_to_timestamp(ts, F.lit("yyyyMMddHHmmss")).alias("fetch_ts"),
        j["url"].alias("url"),
        j["status"].cast("int").alias("status"),
        j["mime"].alias("mime"),
        j["digest"].alias("digest"),
        j["filename"].alias("filename"),
        j["offset"].cast("long").alias("offset"),
        j["length"].cast("long").alias("length"),
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ directory → parsed index rows. ``spark.read.text`` keeps
    the scan SPLITTABLE — a 300 MB index shard fans out across tasks
    instead of pinning to one like a binary blob would."""
    return parse_cdxj_lines(spark.read.text(path))


def cdx_frontier_seeds(
    index: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mime_prefixes: tuple[str, ...] = ("text/html",),
) -> DataFrame:
    """Index rows → frontier seed urls: successful fetches of wanted
    mime types, deduplicated on url keeping the LATEST capture (the
    index lists every historical capture of a url; a frontier wants
    each url once). One url-keyed exchange for the latest-capture
    window; everything before it is a map-side filter the scan can
    push."""
    from pyspark.sql import Window

    mime_ok = F.lit(False)
    for p in mime_prefixes:
        mime_ok = mime_ok | F.col("mime").startswith(p)
    f = index.filter(
        F.col("url").isNotNull()
        & F.col("status").isin(*statuses)
        & mime_ok
    )
    w = Window.partitionBy("url").orderBy(
        F.col("fetch_ts").desc_nulls_last(), F.col("digest").asc_nulls_last()
    )
    return (
        f.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "fetch_ts", "digest")
    )


def serialize_cdxj(
    records: DataFrame,
    urlkey_col: str = "urlkey",
    ts_col: str = "fetch_ts",
) -> Column:
    """Fixture builder: one CDXJ line per row (expression, attach via
    ``select``). Timestamp renders as yyyyMMddHHmmss; the JSON blob is
    built with ``to_json`` over the standard fields."""
    blob = F.to_json(
        F.struct(
            F.col("url"),
            F.col("status").cast("string").alias("status"),
            F.col("mime"),
            F.col("digest"),
            F.col("filename"),
            F.col("offset").cast("string").alias("offset"),
            F.col("length").cast("string").alias("length"),
        )
    )
    return F.concat_ws(
        " ",
        F.col(urlkey_col),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss"),
        blob,
    )
