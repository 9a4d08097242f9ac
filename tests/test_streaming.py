"""Structured-Streaming surface: windowed ingest stats over a pages
stream equal the equivalent batch aggregation; the stateful per-host
gap monitor carries state across micro-batches (SURVEY §2.7)."""

from wos_crawler_spark.fixtures.synth import pages_table
from wos_crawler_spark.streaming.ingest import (
    host_gap_monitor,
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


def test_host_gap_monitor_stateful(spark, tmp_path):
    """State persists across micro-batches: violations accumulate per
    host; clean hosts report zero."""
    src = str(tmp_path / "fetch_stream")
    # two micro-batch files (maxFilesPerTrigger=1): polite host a spaced
    # 1.0s apart; host b violates within AND across batches (gap 0.2s)
    rows1 = [("a.com", 0.0), ("a.com", 1.0), ("b.com", 0.0), ("b.com", 0.2)]
    rows2 = [("a.com", 2.0), ("b.com", 0.4), ("b.com", 5.0)]
    schema = "host string, scheduled_ts double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    mon = host_gap_monitor(stream, min_gap_s=1.0)
    q = run_stream_to_memory(mon, "gap_monitor", mode="update")
    try:
        q.processAllAvailable()
        # last emitted row per host = cumulative totals
        rows = spark.sql(
            "select * from gap_monitor"
        ).collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        latest[r["host"]] = max(
            latest.get(r["host"], (0, 0)), (r["fetches"], r["violations"])
        )
    # a.com: 3 fetches, gaps 1.0, 1.0 -> 0 violations
    assert latest["a.com"] == (3, 0)
    # b.com: 4 fetches, gaps 0.2 (v), 0.2 (v), 4.6 (ok) -> 2 violations
    assert latest["b.com"] == (4, 2)


def test_streaming_politeness_assigns_slots(spark, tmp_path):
    """Streaming F4 twin: the token bucket ASSIGNS one slot per
    delay_s per host, carrying next_free across micro-batches."""
    from wos_crawler_spark.streaming.ingest import streaming_politeness

    src = str(tmp_path / "frontier_stream")
    schema = "host string, url string, arrival_ts double"
    b1 = [("a.com", "u1", 0.0), ("a.com", "u2", 0.0), ("b.com", "u3", 5.0)]
    b2 = [("a.com", "u4", 0.0), ("b.com", "u5", 5.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        streaming_politeness(stream, delay_s=2.0), "sched", mode="append"
    )
    try:
        q.processAllAvailable()
        got = {
            r["url"]: r["scheduled_ts"]
            for r in spark.sql("select * from sched").collect()
        }
    finally:
        q.stop()
    # batch 1: a.com u1@0.0, u2@2.0; b.com u3@5.0
    # batch 2 (state carried): a.com u4@4.0; b.com u5@7.0
    assert got == {"u1": 0.0, "u2": 2.0, "u3": 5.0, "u4": 4.0, "u5": 7.0}


def test_streaming_frontier_dedup(spark, tmp_path):
    """Streaming F1 twin: re-discoveries within the watermark window
    are dropped; each url_hash survives exactly once."""
    from wos_crawler_spark.streaming.ingest import streaming_frontier_dedup

    src = str(tmp_path / "dedup_stream")
    schema = "url_hash long, url string, discovered_ts timestamp"
    rows1 = [
        (1, "u1", "2026-01-01 00:00:00"),
        (2, "u2", "2026-01-01 00:00:01"),
        (1, "u1", "2026-01-01 00:00:02"),  # intra-batch dup
    ]
    rows2 = [
        (2, "u2", "2026-01-01 00:00:10"),  # cross-batch dup
        (3, "u3", "2026-01-01 00:00:11"),
    ]
    df1 = spark.createDataFrame(
        [(h, u, __import__("datetime").datetime.fromisoformat(t))
         for h, u, t in rows1],
        schema,
    )
    df2 = spark.createDataFrame(
        [(h, u, __import__("datetime").datetime.fromisoformat(t))
         for h, u, t in rows2],
        schema,
    )
    df1.coalesce(1).write.mode("overwrite").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        streaming_frontier_dedup(stream), "deduped", mode="append"
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r["url_hash"]
            for r in spark.sql("select * from deduped").collect()
        )
    finally:
        q.stop()
    assert got == [1, 2, 3]


def test_streaming_curation_matches_batch(spark, tmp_path):
    """The stateless corpus-gate chain lifts onto a stream unchanged:
    streamed output ≡ the same exprs applied in batch."""
    from wos_crawler_spark.streaming.ingest import streaming_curation

    src = str(tmp_path / "pages_cur")
    pages = pages_table(spark, 300, partitions=3).withColumn(
        "text", F.concat(F.col("text"), F.lit(" reach me a@b.io"))
    )
    pages.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = run_stream_to_memory(
        streaming_curation(stream), "curated", mode="append"
    )
    try:
        q.processAllAvailable()
        got = {
            r["url"]: (r["lang_pred"], r["n_pii"], r["text"])
            for r in spark.sql("select * from curated").collect()
        }
    finally:
        q.stop()

    batch = {
        r["url"]: (r["lang_pred"], r["n_pii"], r["text"])
        for r in streaming_curation(spark.read.parquet(src)).collect()
    }
    assert got == batch and len(got) > 0
    assert all(v[1] >= 1 and "<EMAIL>" in v[2] for v in got.values())


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """The HLL register table lifts onto readStream unchanged (it is
    a groupBy-max — update-mode streaming state), so per-host
    distinct-URL sketches can be maintained live during a crawl and
    the final registers equal the batch sketch of the same rows."""
    from wos_crawler_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    src = str(tmp_path / "url_stream")
    rows = [
        (f"h{i % 3}", f"https://h{i % 3}.ex/p/{i % 40}")
        for i in range(600)
    ]
    schema = "host string, url string"
    # two micro-batch files so state genuinely carries across batches
    spark.createDataFrame(rows[:300], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(rows[300:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    regs = hll_registers(stream, "url", p=8, group_cols=["host"])
    from wos_crawler_spark.streaming.ingest import run_stream_to_memory

    q = run_stream_to_memory(regs, "hll_regs", mode="update")
    try:
        q.processAllAvailable()
        # update mode re-emits rows per batch: latest value per key
        got_rows = spark.sql(
            "select host, bucket, max(rho) as rho from hll_regs "
            "group by host, bucket"
        ).collect()
    finally:
        q.stop()
    got = sorted((r["host"], r["bucket"], r["rho"]) for r in got_rows)
    batch_df = spark.createDataFrame(rows, schema)
    expect = sorted(
        map(
            tuple,
            hll_registers(
                batch_df, "url", p=8, group_cols=["host"]
            ).collect(),
        )
    )
    assert got == expect and len(got) > 0
    # and the estimates from those registers are sane per host
    est = {
        r["host"]: r["est"]
        for r in hll_estimate(
            spark.createDataFrame(
                got, "host string, bucket long, rho int"
            ),
            p=8,
            group_cols=["host"],
        ).collect()
    }
    for h in ("h0", "h1", "h2"):
        truth = len({u for hh, u in rows if hh == h})
        assert abs(est[h] - truth) / truth < 0.25, (h, est[h], truth)


def test_streaming_url_gate_matches_batch(spark, tmp_path):
    """url_quality_gate is a pure projection, so it lifts onto a
    frontier stream unchanged — the pre-fetch gate can run live on
    discovered URLs before they ever reach the scheduler."""
    from wos_crawler_spark.operators.urlgate import url_quality_gate

    src = str(tmp_path / "frontier_urls")
    urls = spark.createDataFrame(
        [
            ("https://a.com/articles/good.html",),
            ("https://a.com/theme/style.css",),
            ("https://a.com/" + "d/" * 20 + "deep",),
            ("https://a.com/free-casino",),
        ],
        "url string",
    )
    urls.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = run_stream_to_memory(
        url_quality_gate(stream, banned_words=["casino"]),
        "gated", mode="append",
    )
    try:
        q.processAllAvailable()
        got = {
            r["url"]: r["url_keep"]
            for r in spark.sql("select * from gated").collect()
        }
    finally:
        q.stop()
    batch = {
        r["url"]: r["url_keep"]
        for r in url_quality_gate(
            spark.read.parquet(src), banned_words=["casino"]
        ).collect()
    }
    assert got == batch and sum(got.values()) == 1


def test_streaming_mg_summaries_match_batched_twin(spark, tmp_path):
    """Live Misra-Gries heavy-hitter summaries: shard state carries
    across micro-batches, final (max-version) summaries equal a
    python twin folding the same per-batch value_counts per shard,
    and recounting the streamed candidates recovers the exact top-k."""
    from collections import Counter

    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.heavyhitters import _fold_counts
    from wos_crawler_spark.streaming.ingest import (
        run_stream_to_memory,
        streaming_heavy_hitter_summaries,
    )

    # skewed key stream: host h{i} dominates in inverse-square counts
    def mk(lo, hi):
        rows = []
        for i in range(lo, hi):
            rows.append((i, f"h{min(i % 97, (i * i) % 13):02d}"))
        return rows

    b1, b2 = mk(0, 900), mk(900, 1800)
    schema = "id long, host string"
    src = str(tmp_path / "mg_stream")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    m, shards = 6, 4
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_heavy_hitter_summaries(stream, "host", m=m, shards=shards)
    q = run_stream_to_memory(out, "mg_summ", mode="append")
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "select * from mg_summ s where version = "
            "(select max(version) from mg_summ t where t.shard = s.shard)"
        ).collect()
    finally:
        q.stop()
    got = {}
    for r in rows:
        got.setdefault(r.shard, {})[r.key] = r.mg

    # shard assignment taken from the engine itself (xxhash64 twin
    # for strings is out of scope — the twin tests the FOLD, not the hash)
    all_rows = b1 + b2
    keys = sorted({h for _, h in all_rows})
    shard_of = {
        r.key: r.shard
        for r in spark.createDataFrame([(k,) for k in keys], "key string")
        .select("key", F.pmod(F.xxhash64("key"), F.lit(shards)).cast("int").alias("shard"))
        .collect()
    }

    want = {}
    for batch in (b1, b2):
        per_shard = {}
        for _, h in batch:
            per_shard.setdefault(shard_of[h], []).append(h)
        for s, ks in per_shard.items():
            want.setdefault(s, {})
            _fold_counts(want[s], dict(Counter(ks)), m)
    assert got == {s: d for s, d in want.items() if d}

    # streamed candidates cover the exact top-3, recount agrees
    truth = Counter(h for _, h in all_rows)
    top3 = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    cand_keys = {k for d in got.values() for k in d}
    assert {k for k, _ in top3} <= cand_keys


def test_streaming_classifier_gate_matches_batch(spark, tmp_path):
    """The model gate (Arrow classifier_score) lifts onto a stream
    unchanged — weights ship in the closure, each micro-batch is
    annotated in place, streamed keep-set ≡ batch keep-set."""
    import numpy as np

    from wos_crawler_spark.streaming.ingest import (
        run_stream_to_memory,
        streaming_classifier_gate,
    )

    nb = 256
    rng = np.arange(nb, dtype=np.int64)
    weights = ((rng * 2654435761) % 2001 - 1000).astype(np.int64)

    src = str(tmp_path / "pages_clf")
    pages_table(spark, 200, partitions=2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = run_stream_to_memory(
        streaming_classifier_gate(stream, weights, nb), "clf_gate",
        mode="append",
    )
    try:
        q.processAllAvailable()
        got = {
            r["url"]: (r["w_sum"], r["n_feat"])
            for r in spark.sql("select * from clf_gate").collect()
        }
    finally:
        q.stop()

    batch = {
        r["url"]: (r["w_sum"], r["n_feat"])
        for r in streaming_classifier_gate(
            spark.read.parquet(src), weights, nb
        ).collect()
    }
    assert got == batch and len(got) > 0
