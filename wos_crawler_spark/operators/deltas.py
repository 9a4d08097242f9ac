"""Snapshot-to-snapshot corpus delta — what changed between two
crawls: the incremental-pipeline primitive that feeds recrawl
scheduling (changed urls raise their change-rate estimate), dedup
index maintenance (added docs are the increment), and downstream
curation (only added/changed rows re-enter the gate chain).

Reference behavior: the reference crawler has no incremental story
(every run re-crawls its query); at 10^10 urls the delta IS the
workload — Common Crawl publishes monthly snapshots and production
pipelines process snapshot diffs, not full snapshots.

Scale shape: ONE key-keyed full-outer join carrying only (key,
16-byte digest) — text is digested map-side and never rides the
shuffle. At production both snapshots live bucket-partitioned by url
(the Iceberg ``bucket(url)`` layout every other url-keyed join here
assumes), making this a storage-partitioned join with no exchange at
all. Classification is a pure projection over the join result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """``(key, status, old_digest, new_digest)`` with status one of
    ``added`` / ``removed`` / ``changed`` (and ``unchanged`` when
    asked). Content identity is the md5 of the raw text; NULL text
    digests as NULL and compares null-safely (NULL→NULL is
    unchanged, NULL→text is changed)."""
    o = old.select(
        F.col(key_col).alias("key"),
        F.md5(F.col(text_col)).alias("old_digest"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("key"),
        F.md5(F.col(text_col)).alias("new_digest"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "key", "full")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_digest").eqNullSafe(F.col("new_digest")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    out = j.select("key", status.alias("status"), "old_digest", "new_digest")
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
