"""Structured-Streaming surface (SURVEY.md §2.7 — optional post-v1
capability map; the reference's loop is batch-iterative, its Twisted
async IO is concurrency, not a streaming data model).

Implemented streaming mappings:
- tumbling-window ingest stats over a pages stream (per-wave batching
  analog): windowed count/bytes per lang with a watermark for late
  ``warc_ts`` arrivals (retry-TTL analog F7/F8);
- a stateful per-host fetch-gap monitor via ``applyInPandasWithState``
  (the downloader-slot analog, SURVEY §2.7): carries
  (last_fetch_ts, fetches, violations) per host across micro-batches
  and flags politeness-gap violations incrementally.

Batch-driven smoke usage (tests): parquet source dir → memory sink →
``processAllAvailable()``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
            # octet_length = actual UTF-8 bytes (length() counts CHARS
            # — 3x under-report on CJK corpora)
            F.sum(F.octet_length("text")).alias("text_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "text_bytes",
        )
    )


#: Output schema of :func:`host_gap_monitor` — one row per (host,
#: micro-batch) with cumulative counters.
GAP_MONITOR_SCHEMA = (
    "host string, fetches long, violations long, last_ts double"
)
_GAP_STATE_SCHEMA = "last_ts double, fetches long, violations long"


def host_gap_monitor(
    fetch_stream: DataFrame, min_gap_s: float
) -> DataFrame:
    """Custom stateful operator (SURVEY §2.7): per-host politeness
    monitor over a stream of fetch events ``(host, scheduled_ts)``.

    Keyed ``applyInPandasWithState`` keeps (last_fetch_ts, fetches,
    violations) per host across micro-batches — the streaming twin of
    the scheduler's token-bucket invariant (F4): any two fetches of one
    host closer than ``min_gap_s`` is a violation. Emits one cumulative
    row per host per micro-batch that saw that host.

    State is O(hosts) and timeout-free (a production deployment would
    use ProcessingTimeTimeout to expire idle hosts)."""

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            last_ts, fetches, violations = state.get
        else:
            last_ts, fetches, violations = None, 0, 0
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf["scheduled_ts"].tolist())
        ts_all.sort()
        for ts in ts_all:
            if last_ts is not None and ts - last_ts < min_gap_s - 1e-9:
                violations += 1
            last_ts = ts
            fetches += 1
        state.update((last_ts, fetches, violations))
        yield pd.DataFrame(
            {
                "host": [host],
                "fetches": [fetches],
                "violations": [violations],
                "last_ts": [last_ts],
            }
        )

    return (
        fetch_stream.select("host", "scheduled_ts")
        .groupBy("host")
        .applyInPandasWithState(
            _update,
            outputStructType=GAP_MONITOR_SCHEMA,
            stateStructType=_GAP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_frontier_dedup(
    frontier_stream: DataFrame,
    event_col: str = "discovered_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of F1 (URL-seen dedup): Spark's native stateful
    stream deduplication on ``url_hash``, state bounded by the
    watermark (``dropDuplicatesWithinWatermark`` — a URL re-discovered
    later than the watermark re-emits; the durable long-horizon seen
    set stays the batch Bloom/anti-join pair, this bounds the
    *in-flight* window where re-discovery storms actually happen).
    Rows must carry an event-time column for the watermark."""
    return frontier_stream.withWatermark(
        event_col, watermark
    ).dropDuplicatesWithinWatermark(["url_hash"])


#: Output of :func:`streaming_politeness`: the input row's identity
#: plus its assigned fetch slot.
_SCHED_SCHEMA = "host string, url string, scheduled_ts double"
_SCHED_STATE_SCHEMA = "next_free double"


def streaming_politeness(
    frontier_stream: DataFrame, delay_s: float
) -> DataFrame:
    """Streaming twin of F4 (politeness SCHEDULING, not just
    monitoring): a keyed ``applyInPandasWithState`` token bucket that
    ASSIGNS ``scheduled_ts`` to each candidate — one slot every
    ``delay_s`` per host — carrying the host's next-free slot across
    micro-batches. Within a micro-batch, candidates order by
    (url_hash-free) url for determinism, matching the batch
    scheduler's within-bucket ordering contract at single-host grain.

    State is one double per host (O(hosts), same as the batch
    scheduler's salt-bucket counters); production expires idle hosts
    with ProcessingTimeTimeout."""

    def _assign(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        next_free = state.get[0] if state.exists else 0.0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values("url", kind="mergesort")
        ts = []
        for want in rows["arrival_ts"]:
            slot = max(float(want), next_free)
            ts.append(slot)
            next_free = slot + delay_s
        state.update((next_free,))
        yield pd.DataFrame(
            {
                "host": host,
                "url": rows["url"].to_numpy(),
                "scheduled_ts": ts,
            }
        )

    return (
        frontier_stream.select("host", "url", "arrival_ts")
        .groupBy("host")
        .applyInPandasWithState(
            _assign,
            outputStructType=_SCHED_SCHEMA,
            stateStructType=_SCHED_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_MG_SCHEMA = "shard int, version long, key string, mg long"
_MG_STATE_SCHEMA = "version long, keys array<string>, counts array<long>"


def streaming_heavy_hitter_summaries(
    stream: DataFrame,
    key_col: str,
    m: int = 64,
    shards: int = 8,
) -> DataFrame:
    """Streaming twin of :mod:`operators.heavyhitters`: live
    Misra-Gries summaries maintained across micro-batches — the
    "which hosts dominate the crawl RIGHT NOW" monitor, O(shards·m)
    state total.

    Keys hash-shard across ``shards`` independent summaries (the
    parallelism axis — one ``applyInPandasWithState`` group each);
    because a key lands in exactly ONE shard, the union of shard
    summaries is itself a mergeable MG summary, and any key whose
    count within its shard exceeds N_shard/(m+1) is guaranteed
    present. Each micro-batch folds its vectorized ``value_counts``
    into the shard state by the same mergeable reduce as the batch
    operator (shared ``_fold_counts``), then emits the full shard
    summary stamped with a monotone ``version`` — downstream keeps
    the max-version rows per shard (the memory-sink analog of an
    update-mode upsert)."""
    from wos_crawler_spark.operators.heavyhitters import _fold_counts

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            version, keys, counts = state.get
            summary = dict(zip(keys, counts))
        else:
            version, summary = 0, {}
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        _fold_counts(summary, batch["key"].value_counts().to_dict(), m)
        version += 1
        state.update((version, list(summary), [int(v) for v in summary.values()]))
        yield pd.DataFrame(
            {
                "shard": shard,
                "version": version,
                "key": list(summary),
                "mg": list(summary.values()),
            }
        )

    keyed = stream.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col(key_col).cast("string").alias("key"),
    ).where(F.col("key").isNotNull())
    return keyed.groupBy("shard").applyInPandasWithState(
        _update,
        outputStructType=_MG_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_curation(pages: DataFrame) -> DataFrame:
    """Streaming twin of the corpus-gate chain's STATELESS stages:
    language-ID gate, quality gate, PII count + redaction — all pure
    per-row Catalyst exprs, so they lift onto a stream unchanged (no
    state, no watermark needed; the stateful stages — exact dedup,
    split bookkeeping — stay batch or use
    ``dropDuplicatesWithinWatermark`` on the text digest, mirroring
    ``streaming_frontier_dedup``). Input: the pages stream
    (url, warc_ts, text, lang); output adds lang_pred, n_pii,
    redacted text — the filter thresholds match pipeline_curation."""
    from wos_crawler_spark.operators.pii import pii_counts, redact_pii
    from wos_crawler_spark.operators.textquality import lang_id, quality_features

    t = F.col("text")
    d = pages.withColumn("lang_pred", lang_id(t)).filter(
        F.col("lang_pred").isin("en", "de")
    )
    d = quality_features(d).filter(
        (F.col("q_n_words") >= 5) & (F.col("q_n_chars") >= 30)
    )
    n_pii = None
    for _, cnt in pii_counts(t):
        n_pii = cnt if n_pii is None else (n_pii + cnt)
    return d.select(
        "url", "warc_ts", "lang", "lang_pred",
        F.coalesce(n_pii, F.lit(0)).cast("long").alias("n_pii"),
        redact_pii(t).alias("text"),
    )


def streaming_classifier_gate(pages: DataFrame, weights, n_buckets: int) -> DataFrame:
    """Streaming twin of the MODEL gate (textclassify.classifier_score
    — the Arrow scale path): the trained weight vector ships once per
    executor inside the mapInPandas closure and every micro-batch is
    annotated in place, so the fastText-style quality gate lifts onto
    a stream with no state, no watermark, and zero shuffles — the
    steady-state ingest shape: score pages as they are fetched
    instead of in a nightly batch. Same bit-exact integers as the
    batch flavor (test-pinned by batch-equality)."""
    from wos_crawler_spark.operators.textclassify import classifier_score

    scored = classifier_score(
        pages.select("url", "warc_ts", "text"),
        weights,
        id_col="url",
        n_buckets=n_buckets,
    )
    return scored.filter(F.col("clf_keep")).select(
        "url", "warc_ts", "w_sum", "n_feat"
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
