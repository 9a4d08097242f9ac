"""The batch-iterative crawl engine: checkpointed wave loop
(SURVEY.md §3.4 — the Spark mirror of the reference's
spider→scheduler→downloader→parser pipeline, EP1/EP2).

Per wave K:

    frontier_K ─ robots LPM broadcast join (F3/J2)
               ─ Bloom prefilter + exact anti-join dedup (F1/J1)
                 (retries carry dont_filter=true and bypass dedup,
                  like Scrapy's Request.dont_filter on retry)
               ─ per-host priority quota + salted token bucket (W1/F4)
               ─ "fetch" = equi join against pages on url (J3; the
                 sandbox stand-in for HTTP per SURVEY S2)
               ─ parse hits (mapInPandas, P1–P15)  [optional]
               ─ expand: hits ⋈ links → next candidates (depth+1, F8)
               ─ misses → retry rows (attempt+1 ≤ max_retries, F7)
    frontier_{K+1} = expansions ∪ retries (U1)
    seen += this wave's scheduled url_hashes (U2); Bloom merged+rebroadcast
    checkpoint(frontier, seen_delta, bloom, metrics) → atomic commit

The driver holds only counters and the Bloom bytes — row data never
reaches the driver (no collect anywhere). Each wave's plan starts from
a parquet read, so lineage stays O(1) in the wave count.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wos_crawler_spark.functions.urlnorm import with_url_canon
from wos_crawler_spark.operators import checkpoint as ckpt
from wos_crawler_spark.operators.bloom import (
    AnyBloom,
    BankedBloomFilter,
    BloomFilter,
    bloom_from_bytes,
    build_banked_bloom,
    build_bloom,
)
from wos_crawler_spark.operators.dedup import dedup_frontier
from wos_crawler_spark.operators.parse_plaintext import parse_pages
from wos_crawler_spark.operators.politeness import schedule_wave
from wos_crawler_spark.operators.robots import robots_filter

FRONTIER_COLS = [
    "url",
    "url_canon",
    "url_hash",
    "host",
    "priority",
    "depth",
    "discovered_wave",
    "attempt",
    "query_id",
    "dont_filter",
    "lineage",
]


@dataclass
class CrawlConfig:
    delay_s: float = 1.0
    quota: int | None = None  # per-host fetches per wave (W1)
    max_waves: int = 4
    max_depth: int = 3  # F8
    max_retries: int = 2  # F7 (Scrapy RETRY_TIMES default)
    rows_per_bucket: int = 10_000  # politeness salt granularity
    bloom_capacity: int = 1_000_000
    bloom_fpp: float = 0.01
    #: Bank-shard the URL-seen filter into B banks routed by the top
    #: log2(B) hash bits (north_rule 10^10 layout: per-executor memory
    #: and broadcast size drop to m/B; build/merge stay per-bank).
    #: 1 = monolithic filter, identical bits to the banked B=1 case.
    bloom_banks: int = 1
    #: URL-seen sketch flavor: "bloom" (OR-mergeable bit array) or
    #: "cuckoo" (operators/cuckoo.py — supports DELETE for recrawl
    #: eviction; merge folds by fingerprint re-insert). The north rule
    #: names both. bloom_banks doubles as the cuckoo shard count.
    seen_filter: str = "bloom"
    #: Use the Bloom as a pre-shuffle filter inside dedup (F1). The
    #: filter itself is ALWAYS built, merged and checkpointed per wave
    #: (it is the engine's persistent URL-seen sketch); this knob only
    #: decides whether candidates are probed against it before the
    #: exact anti-join. Cost model: the prefilter pays when the
    #: anti-join's exchange moves bytes over a network (real cluster,
    #: rediscovery-heavy steady state) and loses when the exchange is
    #: node-local and seen is co-partitioned — measured in this sandbox
    #: at 5M candidates vs 4.5M seen: exact-only 1.2s, prefilter+rescue
    #: 15.7s (two Arrow passes + 12 MB random probes dominate).
    bloom_prefilter: bool = True
    #: F3 gate semantics: False = longest-prefix match (the
    #: simulator-pinned default), True = full RFC 9309 ``*``/``$``
    #: wildcard patterns (robots.robots_verdict_rfc) — identical
    #: verdicts on wildcard-free rule sets.
    robots_wildcards: bool = False
    #: Crawl-trap guard (operators/trapguard.py): cap on distinct
    #: urls per (host, url-shape) per wave, applied to fresh
    #: candidates after the robots gate and before seen-dedup
    #: (retries bypass, like F1). None = off (default — the guard
    #: adds one shape-keyed exchange to the wave when enabled).
    trap_cap: int | None = None
    #: kept sample per trap shape (None → trap_cap).
    trap_keep: int | None = None
    #: F1h URL-level quality gate (operators/urlgate.py): the
    #: pre-fetch filter — asset extensions, over-deep/over-long/
    #: digit-saturated paths, banned substrings — applied to FRESH
    #: candidates on their canonical url, next to the trap guard
    #: (retries bypass, like F1). Pure map-side projection: enabling
    #: it adds zero exchanges to the wave.
    url_gate: bool = False
    #: url_keep_expr keyword overrides (thresholds, banned_words,
    #: blocked_extensions) — passed verbatim to the expr AND to the
    #: simulator twin, so both gates are parameterized identically.
    url_gate_kwargs: dict = field(default_factory=dict)
    #: Politeness/quota keyed on the REGISTRABLE DOMAIN (eTLD+1,
    #: operators/blocklist.py::registrable_domain) instead of the raw
    #: host: blog.shop.example.co.uk and www.example.co.uk are ONE
    #: registrant, and host-keyed budgets hand a subdomain farm
    #: exactly the multiplier it wants. Scheduling-unit change ONLY —
    #: robots stays per-host (RFC 9309 is host-scoped), the frontier
    #: keeps the true host, and fetch logs / metrics / retries carry
    #: the true host; with this on, a host_delays dim must be keyed
    #: by registrable domain. Composes with `backoff`: the backoff
    #: stats, delay dim and quarantine all key on the registrable
    #: domain too (one dead subdomain farm escalates as ONE
    #: registrant), matching the scheduling key by construction.
    politeness_domain: bool = False
    #: Full-Public-Suffix-List rules for politeness_domain's eTLD+1
    #: (raw PSL rule strings incl. ``*.`` wildcards and ``!``
    #: exceptions — operators/blocklist.py::registrable_domain_psl,
    #: one driver-side parse + zero-shuffle Arrow evaluation). None =
    #: the literal-subset expression (the r1–r4 default). Tuple so
    #: the config stays hashable/serializable.
    psl_rules: tuple | None = None
    #: Per-host adaptive backoff + circuit breaker
    #: (operators/backoff.py): cumulative fetch-outcome stats per host
    #: (bounded by hosts, folded per wave) drive two integer-threshold
    #: rules — high-miss hosts get their base delay MULTIPLIED
    #: (composing with the robots Crawl-delay dim), dead hosts get
    #: quarantined (candidates dropped at wave admission — this
    #: deliberately supersedes the retries-never-dropped contract;
    #: quarantine IS the judgment that retrying is waste). The python
    #: simulator implements identical rules; parity-tested.
    backoff: bool = False
    #: backoff_plan keyword overrides (min_fetches, err_pct, factor,
    #: quarantine_pct) — passed verbatim to the engine plan AND the
    #: simulator twin.
    backoff_kwargs: dict = field(default_factory=dict)
    #: Redirect-resolution hop cap (operators/redirects.py) used when
    #: run_crawl is given a ``redirects`` edge table: chains are
    #: resolved ONCE by path doubling before the wave loop, and every
    #: url entering the frontier (seeds + per-wave expansions) is
    #: rewritten to its landing url — cycles and over-cap chains are
    #: refused at admission, like an HTTP client's redirect cap.
    redirect_max_hops: int = 8
    parse: bool = True
    ckpt_dir: str | None = None
    #: Keep each wave's fetched/parsed caches alive so the returned
    #: CrawlResult.fetch_log / .parsed read them for free (default —
    #: benches and tests consume them). Long checkpointed crawls set
    #: False: every wave's cache is unpersisted once its counters and
    #: checkpoint are committed (the checkpoint store is the durable
    #: record), so executor storage stays O(1) in wave count instead
    #: of accumulating every wave's page payloads.
    keep_wave_caches: bool = True
    #: Score-driven frontier ordering (SURVEY W1 end-to-end): after
    #: each wave, re-prioritize EVERY next-frontier row (expansions,
    #: retries, quota overflow) by integer OPIC importance
    #: (operators/linkgraph.py::opic_int — Abiteboul 2003, the online
    #: estimate OPIC exists for) computed over the cumulative link
    #: edges observed from fetched pages; rows without a score keep
    #: their inherited priority. All-integer cash units make the
    #: python simulator twin (opic_int_python) bit-identical, so the
    #: fetch-order parity contract extends to score-driven ordering.
    opic_priority: bool = False
    #: opic_int rounds per wave (importance ∈ [0, (iters+1)·scale]
    #: must fit the frontier's int32 priority — guarded at run_crawl).
    opic_iters: int = 3
    #: integer cash units per unit of total importance mass; pick
    #: scale >> expected node count for resolution.
    opic_scale: int = 1_000_000
    #: Per-host dims (robots rules, Crawl-delay/backoff delays,
    #: quarantine set, salt counts) broadcast while they fit; above
    #: this many hosts the broadcast hints are DROPPED and the dim
    #: joins key on host — a bounded exchange instead of a driver
    #: OOM. At the 10^10-URL design point a Common-Crawl-shaped
    #: robots table spans 10^7–10^8 hosts and cannot broadcast; the
    #: robots dim is sized ONCE per crawl (one distinct-count job),
    #: the backoff dim per wave (piggybacked on its existing agg).
    #: None = always broadcast (trusted-small dims, no sizing jobs).
    dim_broadcast_threshold: int | None = 5_000_000
    #: StorageLevel NAME for the two pre-bucketed join-side caches
    #: (pages fetch side, links side). None = Spark's MEMORY_AND_DISK.
    #: "DISK_ONLY" moves both caches out of the JVM heap — the fix for
    #: single-JVM heap spill on very large rungs when spark.local.dir
    #: is tmpfs/NVMe (see _storage; cluster executors holding slices
    #: rarely need it).
    join_cache_storage: str | None = None


@dataclass
class WaveResult:
    wave: int
    scheduled: int
    hits: int
    misses: int
    retried: int
    expanded: int
    parsed_docs: int
    next_start_ts: float
    fetched: DataFrame | None = None
    parsed: DataFrame | None = None
    candidates: DataFrame | None = None  # cached; unpersisted post-ckpt
    part_metrics: DataFrame | None = None  # lazy per-partition counters
    #: lazy (wave, stage, rows) admission-funnel counters — one row per
    #: gate boundary (input → post_robots → post_urlgate → post_trap →
    #: post_dedup, plus retry_bypass), so per-gate drop attribution is
    #: consecutive-stage subtraction; costs one agg job ONLY when
    #: materialized (same contract as part_metrics)
    gate_metrics: DataFrame | None = None
    wall_s: float = 0.0  # driver wall-clock for this wave (incl. ckpt)


@dataclass
class CrawlResult:
    waves: list[WaveResult] = field(default_factory=list)
    seen: DataFrame | None = None
    fetch_log: DataFrame | None = None  # all scheduled fetches, all waves
    parsed: DataFrame | None = None

    @property
    def metrics(self) -> list[dict]:
        """A4: per-wave crawl metrics (the reference's Scrapy
        MemoryStatsCollector dict, per-wave instead of per-run);
        persisted per wave by checkpoint.write_metrics."""
        return [
            {
                k: getattr(w, k)
                for k in (
                    "wave",
                    "scheduled",
                    "hits",
                    "misses",
                    "retried",
                    "expanded",
                    "parsed_docs",
                )
            }
            for w in self.waves
        ]

    def gate_report(self) -> DataFrame | None:
        """Union of every wave's lazy admission-funnel counters
        (``(wave, stage_order, stage, rows)``): per-gate drop
        attribution = consecutive-stage subtraction within a wave.
        Materializing it costs one agg job per wave; until then it is
        free (the frames read the materialized per-wave frontiers)."""
        frames = [w.gate_metrics for w in self.waves if w.gate_metrics is not None]
        if not frames:
            return None
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


#: Above this, seed evaluation falls back to a broadcast theta join.
MAX_INLINE_SEEDS = 4096


def init_frontier(seeds: DataFrame, pages: DataFrame) -> DataFrame:
    """S1/S3/J4: evaluate each advanced query against the pages corpus
    (the reference's AdvancedSearch POST analog). One full pages scan,
    once per crawl. Returns wave-0 frontier rows.

    Seeds are driver-scale (the reference reads a query list FILE on
    the driver — SURVEY S1), so the default path collects them and
    compiles the match into a single codegen'd projection:
    ``explode(filter(array(when(contains(text, term), struct(...)))))``
    — map-only, fused with the scan, no join at all. A
    BroadcastNestedLoopJoin would evaluate the contains() predicate
    INTERPRETED (BNLJ is outside whole-stage codegen) and measured
    ~1.5-3x slower with poor core scaling. Seed lists beyond
    MAX_INLINE_SEEDS fall back to the broadcast theta join."""
    # canonicalize in the SAME projection: fuses with the scan's
    # codegen stage, one pass over the pages cache.
    canon_pages = with_url_canon(pages.select("url", "text"))
    # one bounded job probes size AND fetches the rows (count() +
    # collect() would run the seeds plan twice)
    seed_rows = (
        seeds.select("query_id", "term", "priority")
        .limit(MAX_INLINE_SEEDS + 1)
        .collect()
    )
    if len(seed_rows) > MAX_INLINE_SEEDS:
        seed_rows = None
    if seed_rows is not None:
        hits_arr = F.array(
            *[
                F.when(
                    F.col("text").contains(F.lit(r.term)),
                    F.struct(
                        F.lit(r.query_id).cast("long").alias("query_id"),
                        F.lit(r.priority).cast("int").alias("priority"),
                    ),
                )
                for r in seed_rows
            ]
        )
        # explode the full array and drop nulls AFTER: array filter()
        # is a higher-order function (CodegenFallback — interpreted),
        # while Generate(explode) + a null filter stay inside
        # whole-stage codegen. Row amplification is n_seeds per page,
        # the same work the join would do.
        matches = (
            canon_pages.select(
                "url",
                "url_canon",
                "url_hash",
                "host",
                F.explode(hits_arr).alias("_m"),
            )
            .filter(F.col("_m").isNotNull())
            .select(
                "url", "url_canon", "url_hash", "host",
                F.col("_m.query_id").alias("query_id"),
                F.col("_m.priority").alias("priority"),
            )
        )
        f = matches
    else:
        matches = canon_pages.join(
            F.broadcast(seeds.select("query_id", "term", "priority")),
            F.col("text").contains(F.col("term")),
            "inner",
        )
        f = matches.select(
            "url", "url_canon", "url_hash", "host", "query_id", "priority"
        )
    return (
        f.withColumn("depth", F.lit(0))
        .withColumn("discovered_wave", F.lit(0))
        .withColumn("attempt", F.lit(0))
        .withColumn("dont_filter", F.lit(False))
        .withColumn(
            "lineage", F.concat(F.lit("seed:"), F.col("query_id").cast("string"))
        )
        .select(FRONTIER_COLS)
    )


def init_frontier_advanced(
    queries: list[tuple[int, str, int]],
    pages: DataFrame,
    field_map: dict[str, str] | None = None,
    range_tags: set[str] | None = None,
) -> DataFrame:
    """S3 seed matching with the FULL advanced-query language
    (functions/wosquery.py) instead of single contains() terms:
    ``queries`` is a driver-scale list of ``(query_id, query_string,
    priority)`` — the reference reads exactly such a file (SURVEY S1)
    — and each query compiles to a Catalyst boolean over the page
    row. Same shape as :func:`init_frontier`'s inline path: ONE
    map-only pass fused with the scan,
    ``explode(array(when(pred, struct)))`` + null filter — no join.
    NEAR predicates ride along as interpreted HOFs (still map-side);
    everything else stays codegen'd. Queries are compiled (and
    syntax-checked) on the driver before any job runs."""
    from wos_crawler_spark.functions.wosquery import (
        parse_query,
        to_column,
    )

    fm = field_map or {"TS": "text"}
    compiled = [
        (qid, to_column(parse_query(q, fm, range_tags), fm), prio)
        for qid, q, prio in queries
    ]
    canon_pages = with_url_canon(pages.select("url", "text"))
    hits_arr = F.array(
        *[
            F.when(
                pred,
                F.struct(
                    F.lit(qid).cast("long").alias("query_id"),
                    F.lit(prio).cast("int").alias("priority"),
                ),
            )
            for qid, pred, prio in compiled
        ]
    )
    f = (
        canon_pages.select(
            "url", "url_canon", "url_hash", "host",
            F.explode(hits_arr).alias("_m"),
        )
        .filter(F.col("_m").isNotNull())
        .select(
            "url", "url_canon", "url_hash", "host",
            F.col("_m.query_id").alias("query_id"),
            F.col("_m.priority").alias("priority"),
        )
    )
    return (
        f.withColumn("depth", F.lit(0))
        .withColumn("discovered_wave", F.lit(0))
        .withColumn("attempt", F.lit(0))
        .withColumn("dont_filter", F.lit(False))
        .withColumn(
            "lineage",
            F.concat(F.lit("seed:"), F.col("query_id").cast("string")),
        )
        .select(FRONTIER_COLS)
    )


def expand_frontier(
    hits: DataFrame, links: DataFrame, wave: int, max_depth: int
) -> DataFrame:
    """Frontier expansion: fetched pages emit their outlinks (the
    reference's pagination-request generator S5, parallelized). Depth
    guard F8 applied at expansion time."""
    e = hits.select(
        F.col("url").alias("src_url"),
        "query_id",
        "priority",
        F.col("depth"),
    ).join(links, "src_url", "inner")
    e = e.filter(F.col("depth") + 1 <= max_depth)
    e = with_url_canon(e.select(
        F.col("dst_url").alias("url"),
        "query_id",
        "priority",
        (F.col("depth") + 1).alias("depth"),
        F.col("src_url"),
    ))
    return (
        e.withColumn("discovered_wave", F.lit(wave + 1))
        .withColumn("attempt", F.lit(0))
        .withColumn("dont_filter", F.lit(False))
        .withColumn("lineage", F.concat(F.lit("link:"), F.col("src_url")))
        .select(FRONTIER_COLS)
    )


def _storage(level: str | None):
    """Resolve a StorageLevel by name. ``None``/"MEMORY_AND_DISK" is
    Spark's DataFrame default (deserialized columnar, spills blocks).
    "DISK_ONLY" keeps the cache OUT of the JVM heap entirely — on a
    deployment whose ``spark.local.dir`` is tmpfs/NVMe this trades a
    cheap (de)serialization for zero storage-memory pressure on the
    execution side; measured on this sandbox it removes the
    links-cache heap spill that capped the 24M-row rung (the 128 GiB
    single JVM holds every slice a 1000-executor cluster would
    spread)."""
    from pyspark import StorageLevel

    return getattr(StorageLevel, level or "MEMORY_AND_DISK")


def prepare_fetch_side(
    pages: DataFrame, parts: int, with_text: bool,
    storage_level: str | None = None,
) -> DataFrame:
    """Pre-partition the pages ("server") side of the per-wave fetch
    join ONCE per crawl: hash-partition on ``url`` and sort within
    partitions, then cache. Every wave's J3 join then shuffles only
    the (small) scheduled side — Spark sees the cached side's
    HashPartitioning/ordering and plans a shuffle-one-side SMJ.

    This is the sandbox stand-in for the production layout: an Iceberg
    table ``PARTITIONED BY (bucket(256, url))`` gives the same
    zero-shuffle property via storage-partitioned joins, with no cache
    needed. ``with_text=False`` (schedule-throughput runs, parse off)
    drops the heavy payload column before caching — the join only has
    to prove hit/miss, so shuffling page bytes would be pure waste."""
    cols = ["url", "text", "lang", "warc_ts"] if with_text else [
        "url", "lang", "warc_ts"
    ]
    # `_page_hit` is the hit/miss probe for the left fetch join: always
    # non-null for an existing page. Probing a data column instead
    # (text/warc_ts) miscounts legitimately-null values as misses and
    # re-queues existing pages as retries every wave.
    return (
        pages.select(*cols, F.lit(True).alias("_page_hit"))
        .repartition(parts, "url")
        .sortWithinPartitions("url")
        .persist(_storage(storage_level))
    )


def prepare_links_side(
    links: DataFrame, parts: int, storage_level: str | None = None
) -> DataFrame:
    """Same single-shuffle treatment for the expansion join's links
    side (production: links table bucketed by src_url)."""
    return (
        links.repartition(parts, "src_url")
        .sortWithinPartitions("src_url")
        .persist(_storage(storage_level))
    )


def rewrite_through_redirects(frontier: DataFrame, rmap: DataFrame) -> DataFrame:
    """Apply the admission-time redirect rewrite and re-derive the
    three canon-dependent columns (url_canon/url_hash/host change with
    the landing url; with_url_canon overwrites in place)."""
    from wos_crawler_spark.operators.redirects import redirect_rewrite

    return with_url_canon(redirect_rewrite(frontier, rmap)).select(
        FRONTIER_COLS
    )


def _sched_domain_expr(cfg: "CrawlConfig"):
    """Scheduling-unit key for politeness_domain mode: registrable
    domain via the literal-subset expr (default) or the full-PSL
    Arrow path when ``cfg.psl_rules`` is set (wildcard/exception
    rules honored — operators/blocklist.py::registrable_domain_psl;
    the simulator twin maps hosts through the shared python match
    function, so fetch-order parity covers PSL mode too)."""
    from wos_crawler_spark.operators.blocklist import (
        registrable_domain,
        registrable_domain_psl,
    )

    if cfg.psl_rules is not None:
        rd = registrable_domain_psl(F.col("host"), cfg.psl_rules)
    else:
        rd = registrable_domain(F.col("host"))
    return F.coalesce(rd, F.col("host"))


def _with_sched_domain(
    df: DataFrame, cfg: "CrawlConfig", broadcast_dims: bool = True
) -> DataFrame:
    """``df`` + a ``_sched_dom`` column carrying the politeness
    scheduling unit (registrable domain, raw host fallback).

    Two shapes by rule source:

    - literal-subset expr (default): pure map-side projection — zero
      added exchanges, unchanged from rounds 1–4.
    - full PSL (``cfg.psl_rules``): the Arrow match runs over the
      DISTINCT hosts only, then joins back as a per-host dim — the
      python cost drops from O(frontier rows × call sites) to
      O(hosts) per site (measured on the gate ledger: the per-row
      Arrow pass cost +126% wave time vs the dim join's ~+35%). The
      dim join rides the same size gate as every other per-host dim
      (``broadcast_dims``); the VALUES are identical either way, so
      the simulator fetch-order parity contract is unchanged."""
    if cfg.psl_rules is None:
        return df.withColumn("_sched_dom", _sched_domain_expr(cfg))
    from wos_crawler_spark.operators.blocklist import (
        registrable_domain_psl,
    )

    dim = (
        df.select("host")
        .distinct()
        .withColumn(
            "_sched_dom",
            F.coalesce(
                registrable_domain_psl(F.col("host"), cfg.psl_rules),
                F.col("host"),
            ),
        )
    )
    if broadcast_dims:
        dim = F.broadcast(dim)
    # inner join is safe (every df host appears in its own distinct)
    return df.join(dim, "host", "left").withColumn(
        "_sched_dom", F.coalesce(F.col("_sched_dom"), F.col("host"))
    )


def run_wave(
    spark: SparkSession,
    wave: int,
    frontier: DataFrame,
    pages: DataFrame,
    links: DataFrame | None,
    robots: DataFrame | None,
    seen: DataFrame | None,
    bloom: AnyBloom | None,
    cfg: CrawlConfig,
    wave_start: float,
    host_delays: DataFrame | None = None,
    inter_wave_gap_s: float | None = None,
    rmap: DataFrame | None = None,
    broadcast_dims: bool = True,
) -> tuple[WaveResult, DataFrame, DataFrame]:
    """One wave. ``pages``/``links`` should be pre-partitioned via
    ``prepare_fetch_side``/``prepare_links_side`` (run_crawl does).
    Returns (result, next_frontier, seen_delta).

    ``broadcast_dims``: whether the per-host dims (robots rules,
    host_delays, salt counts) carry broadcast hints — run_crawl sizes
    them against cfg.dim_broadcast_threshold and passes the verdict;
    semantics are identical either way."""
    timing = os.environ.get("WCS_TIMING", "") not in ("", "0")

    def _t(label: str, t0: float) -> None:
        if timing:
            print(f"[crawl-timing]   {label}: {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    # F3: robots gate (map-only broadcast LPM / RFC-9309 wildcards)
    allowed = robots_filter(
        frontier, robots, wildcards=cfg.robots_wildcards,
        broadcast_dims=broadcast_dims,
    )

    # F1/J1: dedup — retries (dont_filter) bypass, like Scrapy.
    # intra=False: the intra-wave url_hash dedup rides the politeness
    # shuffle below (dedup_intra=True) — one full-frontier exchange
    # per wave instead of two.
    filtered = allowed.filter(~F.col("dont_filter"))
    bypass = allowed.filter(F.col("dont_filter"))
    # admission-funnel stage frames for the lazy gate_metrics report
    # (NOT df.observe: the fresh/bypass branches both re-instantiate
    # the `allowed` subtree, and with bloom_prefilter dedup_frontier
    # splits again, so a CollectMetrics node there would be duplicated
    # in one query plan — the lazy count frame is branch-safe and free
    # until materialized)
    gate_stages: list[tuple[str, DataFrame]] = [
        ("input", frontier),
        ("post_robots", allowed),
        ("retry_bypass", bypass),
    ]
    if cfg.url_gate:
        # F1h: URL-level quality gate on fresh candidates (retries
        # bypass — they already passed admission once). Map-side
        # filter on the canonical url; zero added exchanges.
        from wos_crawler_spark.operators.urlgate import url_keep_expr

        filtered = filtered.filter(
            url_keep_expr(F.col("url_canon"), **cfg.url_gate_kwargs)
        )
    gate_stages.append(("post_urlgate", filtered))
    trap_cache = None
    if cfg.trap_cap is not None:
        # F1g: per-(host, shape) explosion cap on FRESH candidates —
        # retries bypass (they already passed admission once). The
        # guard reads its input three times (eager trap count, safe
        # branch, trap branch) — cache the pre-trap image for the
        # wave so the robots/urlgate chain executes once, released
        # below as soon as the candidates cache has materialized.
        from wos_crawler_spark.operators.trapguard import trap_guard

        trap_cache = filtered.cache()
        try:
            # trap_guard is EAGER (runs the trap-count jobs at call
            # time); unpersist the cache before re-raising so the
            # refusal path (>1024 trap shapes) doesn't leak it
            filtered = trap_guard(
                trap_cache, cfg.trap_cap, keep=cfg.trap_keep,
                url_col="url_canon",
            )
        except BaseException:
            trap_cache.unpersist()
            raise
    gate_stages.append(("post_trap", filtered))
    fresh = dedup_frontier(
        filtered, seen, bloom if cfg.bloom_prefilter else None, intra=False
    )
    gate_stages.append(("post_dedup", fresh))
    gate_metrics = None
    for _order, (_name, _df) in enumerate(gate_stages):
        _row = _df.agg(F.count(F.lit(1)).alias("rows")).select(
            F.lit(wave).alias("wave"),
            F.lit(_order).alias("stage_order"),
            F.lit(_name).alias("stage"),
            "rows",
        )
        gate_metrics = (
            _row if gate_metrics is None else gate_metrics.unionByName(_row)
        )
    # ALWAYS cache: the Bloom dedup is a two-branch union (new ∪
    # rescued) and the scheduler reads candidates twice more
    # (salt_counts agg + the schedule join) — without the cache the
    # robots→canon→dedup subtree executes 3-4× per wave.
    candidates = fresh.unionByName(bypass).cache()
    if cfg.politeness_domain:
        # scheduling-unit rewrite: the politeness/quota key becomes
        # the registrable domain for the duration of schedule_wave,
        # then the true host is restored — map-side both ways, no
        # extra exchange (the politeness shuffle just keys on the
        # rewritten column).
        to_sched = (
            _with_sched_domain(candidates, cfg, broadcast_dims)
            .withColumn("_true_host", F.col("host"))
            .withColumn("host", F.col("_sched_dom"))
            .drop("_sched_dom")
        )
        sched = schedule_wave(
            to_sched,
            delay_s=cfg.delay_s,
            wave_start=wave_start,
            quota=cfg.quota,
            rows_per_bucket=cfg.rows_per_bucket,
            dedup_intra=True,
            host_delays=host_delays,
            broadcast_dims=broadcast_dims,
        ).withColumn("host", F.col("_true_host")).drop("_true_host")
    else:
        sched = schedule_wave(
            candidates,
            delay_s=cfg.delay_s,
            wave_start=wave_start,
            quota=cfg.quota,
            rows_per_bucket=cfg.rows_per_bucket,
            dedup_intra=True,
            host_delays=host_delays,
            broadcast_dims=broadcast_dims,
        )

    # J3: "fetch" — resolve url → page payload (left join keeps misses).
    # `fetched` is the ONLY materialization point of the wave: every
    # count/aggregate below reads the cache, so the robots→dedup→
    # schedule→fetch chain executes exactly once per wave. pages is
    # pre-partitioned on url (prepare_fetch_side) → only sched shuffles.
    # hit/miss probe: the join-side marker (always non-null for an
    # existing page — prepare_fetch_side adds it); data-column
    # fallbacks only for callers passing a raw pages frame.
    if "_page_hit" in pages.columns:
        probe = "_page_hit"
    elif "text" in pages.columns:
        probe = "text"
    else:
        probe = "warc_ts"
    fetched = sched.join(pages, "url", "left").cache()
    hits = fetched.filter(F.col(probe).isNotNull())
    misses = fetched.filter(F.col(probe).isNull())

    # one job → all wave metrics (count(probe) skips nulls = hits).
    # parsed_docs counts REAL WoS records (one export page holds up to
    # 500 ER-terminated records — SURVEY S5), not pages: the record
    # count piggybacks on this same cached-scan job as a regexp_count.
    will_parse = cfg.parse and "text" in fetched.columns
    rec_count = (
        F.sum(
            F.when(
                F.col(probe).isNotNull() & F.col("text").isNotNull(),
                F.regexp_count(F.col("text"), F.lit(r"(?m)^ER[ \t]*$")),
            ).otherwise(F.lit(0))
        )
        if will_parse
        else F.lit(0)
    )
    scheduled_n, hits_n, max_ts_row, rec_n = fetched.agg(
        F.count(F.lit(1)), F.count(probe), F.max("scheduled_ts"), rec_count
    ).first()
    if trap_cache is not None:
        # the candidates cache materialized through the trap branches
        # in the agg job above — the pre-trap image is no longer read
        trap_cache.unpersist()

    # A4 (north_rule "per-partition lineage + metrics"): lazy
    # per-partition counter frame over the SAME cache — materialized
    # only by the checkpoint path (commit_wave), costing one map-side
    # agg job there and nothing otherwise. lineage provenance is
    # bucketed by origin kind (seed/link/retry) per partition.
    bytes_agg = (
        F.sum(
            F.when(F.col("text").isNotNull(), F.octet_length("text")).otherwise(0)
        )
        if "text" in fetched.columns
        else F.sum(F.lit(0))
    )
    part_metrics = fetched.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(
        F.count(F.lit(1)).alias("scheduled"),
        F.count(probe).alias("hits"),
        (F.count(F.lit(1)) - F.count(probe)).alias("misses"),
        rec_count.alias("parsed_docs"),
        F.sum(F.when(F.col("lineage").startswith("seed:"), 1).otherwise(0))
        .alias("from_seed"),
        F.sum(F.when(F.col("lineage").startswith("link:"), 1).otherwise(0))
        .alias("from_link"),
        F.sum(F.col("dont_filter").cast("long")).alias("from_retry"),
        bytes_agg.alias("payload_bytes"),
    )
    misses_n = scheduled_n - hits_n
    # cross-wave gap: with per-host Crawl-delays the host owning max_ts
    # may be slower than the default — run_crawl passes the dim's max so
    # the inter-wave spacing stays conservative for every host.
    gap = cfg.delay_s if inter_wave_gap_s is None else inter_wave_gap_s
    next_start = (max_ts_row + gap) if max_ts_row is not None else wave_start
    _t("fetch-agg job", t0)
    t0 = time.time()

    # quota overflow re-queues (the scheduler keeps its pending queue —
    # the reference never drops requests, it pops them later). The
    # candidates multiset still carries intra-wave duplicates (dedup
    # rides the politeness shuffle), so collapse them here with the
    # deterministic rep-order key; the groupBy reuses the anti-join's
    # url_hash partitioning — no extra exchange.
    if cfg.quota is not None:
        rep_key = F.struct(
            (-F.col("priority")).alias("p"),
            F.col("query_id").alias("q"),
            F.col("lineage").alias("l"),
        )
        not_scheduled = candidates.join(
            fetched.select("url_hash"), "url_hash", "left_anti"
        )
        # Only FRESH overflow rows collapse to one representative per
        # url_hash (intra-wave dedup deferred from the politeness
        # shuffle). dont_filter retries pass through un-grouped — the
        # 'retries are never dropped' contract, matching the simulator
        # which keeps every bypass row in overflow.
        fresh_overflow = (
            not_scheduled.filter(~F.col("dont_filter"))
            .groupBy("url_hash")
            .agg(
                F.min_by(
                    F.struct(*[F.col(c).alias(c) for c in FRONTIER_COLS]), rep_key
                ).alias("_r")
            )
            .select("_r.*")
            .select(FRONTIER_COLS)
        )
        overflow = fresh_overflow.unionByName(
            not_scheduled.filter(F.col("dont_filter")).select(FRONTIER_COLS)
        )
    else:
        overflow = None

    # parse (P1–P15)
    parsed = None
    parsed_n = int(rec_n or 0)
    if will_parse and hits_n:
        parsed = parse_pages(hits)

    # F7: retries — attempt+1, dont_filter, re-queued next wave
    retries = (
        misses.select(FRONTIER_COLS)
        .withColumn("attempt", F.col("attempt") + 1)
        .withColumn("dont_filter", F.lit(True))
        .filter(F.col("attempt") <= cfg.max_retries)
    )

    # expansion (S5-parallel)
    if links is not None:
        expansions = expand_frontier(hits, links, wave, cfg.max_depth)
        if rmap is not None:
            # redirect rewrite rides frontier ENTRY (new discoveries
            # only): retries/overflow were rewritten when they first
            # entered, and the rewrite is idempotent anyway (a
            # resolved landing url is terminal, never a source).
            expansions = rewrite_through_redirects(expansions, rmap)
    else:
        expansions = spark.createDataFrame([], frontier.schema)
    next_frontier = expansions.unionByName(retries.select(FRONTIER_COLS))  # U1
    if overflow is not None:
        next_frontier = next_frontier.unionByName(overflow)
    # the union stacks its children's partitions; cap task counts for
    # the checkpoint + next wave (narrow, no shuffle)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    next_frontier = next_frontier.coalesce(parts)
    # retried/expanded counts are filled in by the caller AFTER the
    # next frontier materializes (checkpoint) — no extra jobs here.

    # U2/A2: seen accumulates everything scheduled this wave. The
    # Bloom build over this delta happens in run_crawl, overlapped
    # with the checkpoint jobs.
    _t("retry/expand/overflow plan", t0)
    seen_delta = fetched.select("url_hash").withColumn("wave", F.lit(wave))
    res = WaveResult(
        wave=wave,
        scheduled=scheduled_n,
        hits=hits_n,
        misses=misses_n,
        retried=-1,  # filled by run_crawl post-checkpoint
        expanded=-1,
        parsed_docs=parsed_n,
        next_start_ts=next_start,
        fetched=fetched,
        parsed=parsed,
        candidates=candidates,
        part_metrics=part_metrics,
        gate_metrics=gate_metrics,
    )
    return res, next_frontier, seen_delta


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    links: DataFrame | None = None,
    robots: DataFrame | None = None,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    pages_fetch: DataFrame | None = None,
    links_prepped: DataFrame | None = None,
    host_delays: DataFrame | None = None,
    redirects: DataFrame | None = None,
) -> CrawlResult:
    """Full crawl: wave loop until frontier empty / max_waves.
    With cfg.ckpt_dir set, each wave commits atomically and
    ``resume=True`` restarts from the last committed wave.

    ``redirects``: observed 3xx edges ``(src, dst)`` in CANONICAL url
    space. Resolved ONCE by path doubling (cfg.redirect_max_hops) and
    applied at every frontier entry — see rewrite_through_redirects.

    ``pages_fetch`` / ``links_prepped``: optionally pass join sides
    already laid out by ``prepare_fetch_side`` / ``prepare_links_side``
    (production: an Iceberg table ``PARTITIONED BY (bucket(url))`` /
    ``bucket(src_url)`` arrives pre-bucketed from storage, so the
    layout is a property of the table, not per-crawl work). When
    given, run_crawl neither builds nor unpersists them."""
    cfg = cfg or CrawlConfig()
    out = CrawlResult()

    # per-host Crawl-delay dim (robots.parse_robots_delays): tiny —
    # one driver-side max fixes the conservative cross-wave gap.
    inter_wave_gap: float | None = None
    if host_delays is not None:
        max_delay = host_delays.agg(F.max("crawl_delay")).first()[0]
        inter_wave_gap = max(cfg.delay_s, float(max_delay or 0.0))

    # Size-gate the per-host broadcast dims ONCE per crawl: a robots/
    # delay dim spanning more hosts than dim_broadcast_threshold
    # drops its broadcast hints for the whole run (the dim joins key
    # on host; AQE may still convert small ones back at runtime).
    # The wave-variant backoff dim is re-sized per wave below.
    dims_bcast = True
    if cfg.dim_broadcast_threshold is not None:
        n_dim = 0
        if robots is not None:
            n_dim = robots.select("host").distinct().count()
        if host_delays is not None:
            n_dim = max(n_dim, host_delays.count())
        dims_bcast = n_dim <= cfg.dim_broadcast_threshold

    if cfg.opic_priority:
        bound = (cfg.opic_iters + 1) * cfg.opic_scale
        if bound >= 2**31:
            raise ValueError(
                f"opic_priority: importance bound (opic_iters+1)*"
                f"opic_scale = {bound} overflows the frontier's int32 "
                f"priority; lower opic_scale or opic_iters"
            )

    start_wave = 0
    frontier = None
    seen: DataFrame | None = None
    bloom: AnyBloom | None = None
    wave_start = 0.0
    hit_log: DataFrame | None = None  # opic_priority: cumulative hits

    host_stats: DataFrame | None = None  # backoff: (host, sched, miss)
    if resume and cfg.ckpt_dir:
        last = ckpt.latest_wave(cfg.ckpt_dir)
        if last is not None:
            start_wave = last + 1
            frontier = ckpt.read_frontier(spark, cfg.ckpt_dir, last)
            seen = ckpt.read_seen(spark, cfg.ckpt_dir, last)
            bloom = bloom_from_bytes(ckpt.read_bloom_bytes(cfg.ckpt_dir, last))
            wave_start = ckpt.read_metrics(cfg.ckpt_dir, last)["next_start_ts"]
            if cfg.backoff:
                # backoff policy is a pure function of cumulative host
                # stats — restoring them makes resume ≡ uninterrupted
                # for backoff crawls too (parity-tested)
                host_stats = ckpt.read_host_stats(spark, cfg.ckpt_dir, last)

    timing = os.environ.get("WCS_TIMING", "") not in ("", "0")

    def _t(label: str, t0: float) -> None:
        if timing:
            print(f"[crawl-timing] {label}: {time.time() - t0:.2f}s", flush=True)

    # one-time layout work (production: Iceberg bucket(url)/bucket(src_url)
    # table specs make these free — see prepare_fetch_side docstring)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    t0 = time.time()
    own_layout = pages_fetch is None
    pages_kv = (
        pages_fetch
        if pages_fetch is not None
        else prepare_fetch_side(
            pages, parts, with_text=cfg.parse,
            storage_level=cfg.join_cache_storage,
        )
    )
    if links_prepped is not None:
        links_kv = links_prepped
    else:
        links_kv = (
            prepare_links_side(
                links, parts, storage_level=cfg.join_cache_storage
            )
            if links is not None
            else None
        )

    # redirect map: resolved once per crawl (wave-invariant), cached
    # so the 5-join path-doubling lineage never re-executes per wave.
    rmap = None
    if redirects is not None:
        from wos_crawler_spark.operators.redirects import resolve_redirects

        rmap = (
            resolve_redirects(redirects, max_hops=cfg.redirect_max_hops)
            .select("src", "final", "resolved")
            .cache()
        )
        rmap.count()

    if frontier is None:
        frontier = init_frontier(seeds, pages)
        if rmap is not None:
            frontier = rewrite_through_redirects(frontier, rmap)
    # materialize once: without this, wave 0's seed-match theta join
    # would run twice (emptiness probe + first candidate use)
    frontier = frontier.localCheckpoint()
    frontier_n = frontier.count()
    _t("prep+init", t0)

    fetch_logs = []
    parsed_frames = []
    for wave in range(start_wave, cfg.max_waves):
        if not frontier_n:
            break
        t_wave = time.time()
        # Per-host backoff policy for THIS wave, derived from the
        # cumulative stats of all prior waves (operators/backoff.py):
        # quarantined hosts drop out of the frontier via a broadcast
        # anti-join (map-side; fresh AND retries — see CrawlConfig),
        # backed-off hosts ride the existing host_delays channel into
        # schedule_wave. The inter-wave gap stays conservative under
        # the escalated delays (one driver-scale max over the dim).
        eff_delays, eff_gap = host_delays, inter_wave_gap
        bo = None
        pre_bo_frontier = None
        wave_bcast = dims_bcast
        if cfg.backoff and host_stats is not None:
            from wos_crawler_spark.operators.backoff import backoff_plan

            bo = backoff_plan(
                host_stats, cfg.delay_s, host_delays,
                **cfg.backoff_kwargs,
            ).cache()
            # one agg materializes the bo cache AND sizes the wave's
            # backoff dim (the broadcast gate needs the count anyway
            # — no extra job vs the old max-only agg)
            max_eff, bo_n = bo.agg(
                F.max("crawl_delay"), F.count(F.lit(1))
            ).first()
            eff_gap = max(cfg.delay_s, float(max_eff or 0.0))
            if cfg.dim_broadcast_threshold is not None:
                wave_bcast = (
                    dims_bcast and bo_n <= cfg.dim_broadcast_threshold
                )
            quar = bo.filter(F.col("quarantined")).select(
                F.col("host").alias("_qkey")
            )
            if wave_bcast:
                quar = F.broadcast(quar)
            # with politeness_domain, stats/delays/quarantine all key
            # on the registrable domain (see the stats fold below) —
            # quarantining one dead subdomain cuts off the registrant
            pre_bo_frontier = frontier
            if cfg.politeness_domain:
                fr_keyed = _with_sched_domain(frontier, cfg, wave_bcast)
            else:
                fr_keyed = frontier.withColumn(
                    "_sched_dom", F.col("host")
                )
            frontier = fr_keyed.join(
                quar, F.col("_sched_dom") == F.col("_qkey"), "left_anti"
            ).drop("_sched_dom")
            eff_delays = bo.select("host", "crawl_delay")
        res, next_frontier, seen_delta = run_wave(
            spark, wave, frontier, pages_kv, links_kv, robots, seen, bloom,
            cfg, wave_start,
            host_delays=eff_delays, inter_wave_gap_s=eff_gap,
            rmap=rmap, broadcast_dims=wave_bcast,
        )
        if pre_bo_frontier is not None and res.gate_metrics is not None:
            # prepend the backoff-quarantine boundary so the funnel
            # reads pre_backoff → input → post_robots → … (quarantine
            # drop = pre_backoff − input)
            res.gate_metrics = pre_bo_frontier.agg(
                F.count(F.lit(1)).alias("rows")
            ).select(
                F.lit(wave).alias("wave"),
                F.lit(-1).alias("stage_order"),
                F.lit("pre_backoff").alias("stage"),
                "rows",
            ).unionByName(res.gate_metrics)
        if (
            cfg.opic_priority
            and links_kv is not None
            and not (wave == cfg.max_waves - 1 and not cfg.ckpt_dir)
        ):
            # (final non-checkpointed wave skipped: its next_frontier
            # is discarded, so scoring it would be throwaway jobs —
            # the same rule as the is_final tail-job skip below)
            # Score-driven W1: importance over the CUMULATIVE observed
            # edge set (every fetched hit's outlinks, canon space —
            # raw-dst canon, redirect-blind by design: a landed row
            # whose canon differs simply keeps its inherited
            # priority, mirrored exactly by the simulator twin).
            # Runs BEFORE the frontier checkpoint so the committed
            # frontier carries the new priorities; res.fetched is
            # still cached, so the hits scan is a cache read.
            _probe = "_page_hit" if "_page_hit" in res.fetched.columns else (
                "text" if "text" in res.fetched.columns else "warc_ts"
            )
            wave_hits = res.fetched.filter(
                F.col(_probe).isNotNull()
            ).select("url", "url_canon")
            hit_log = (
                wave_hits
                if hit_log is None
                else hit_log.unionByName(wave_hits)
            ).localCheckpoint()
            e0 = hit_log.join(
                links_kv, hit_log.url == links_kv.src_url
            ).select(
                F.col("url_canon").alias("src"),
                F.col("dst_url").alias("url"),
            )
            edges = with_url_canon(e0).select(
                "src", F.col("url_canon").alias("dst")
            )
            if not edges.isEmpty():
                from wos_crawler_spark.operators.linkgraph import opic_int

                scores = opic_int(
                    edges, n_iter=cfg.opic_iters, scale=cfg.opic_scale
                )
                next_frontier = (
                    next_frontier.join(
                        scores,
                        next_frontier.url_canon == scores.node,
                        "left",
                    )
                    .withColumn(
                        "priority",
                        F.coalesce(
                            F.col("importance").cast("int"),
                            F.col("priority"),
                        ),
                    )
                    .select(FRONTIER_COLS)
                )
        out.waves.append(res)
        if cfg.backoff:
            from wos_crawler_spark.operators.backoff import fold_host_stats

            probe = "_page_hit" if "_page_hit" in res.fetched.columns else (
                "text" if "text" in res.fetched.columns else "warc_ts"
            )
            wave_src = res.fetched
            if cfg.politeness_domain:
                wave_src = (
                    _with_sched_domain(res.fetched, cfg, wave_bcast)
                    .withColumn("host", F.col("_sched_dom"))
                    .drop("_sched_dom")
                )
            host_stats = fold_host_stats(host_stats, wave_src, probe)
            if cfg.ckpt_dir:
                # persist with the wave (before its _COMMITTED marker)
                # and re-read — durability AND lineage truncation
                ckpt.write_host_stats(cfg.ckpt_dir, wave, host_stats)
                host_stats = ckpt.read_host_stats(spark, cfg.ckpt_dir, wave)
            else:
                # lazy here, but FORCED by the wave's concurrent tail
                # jobs below while res.fetched is still cached (a
                # post-unpersist materialization would re-execute the
                # whole wave chain); lineage truncates per wave
                host_stats = host_stats.localCheckpoint(eager=False)
        if cfg.keep_wave_caches:
            fetch_logs.append(
                res.fetched.select(
                    "url", "url_hash", "host", "priority", "discovered_wave",
                    "scheduled_ts", "salt",
                ).withColumn("wave", F.lit(wave))
            )
            if res.parsed is not None:
                parsed_frames.append(res.parsed)
        wave_start = res.next_start_ts

        def _build_wave_bloom() -> AnyBloom:
            """A2: per-partition Bloom partials over this wave's delta,
            OR-folded executor-side, folded into the cross-wave filter.
            bloom_banks > 1 shards build/merge/broadcast per bank.

            On RESUME the checkpointed filter is authoritative for the
            flavor (its banks are already baked into its bit layout);
            a cfg that disagrees in bank count gets the checkpoint's
            flavor, and a cfg whose capacity/fpp produce a different
            bit shape is a hard error — silently merging mismatched
            filters would corrupt the seen sketch."""
            if cfg.seen_filter == "cuckoo" or (
                bloom is not None and bloom.shape[0] == "cuckoo"
            ):
                from wos_crawler_spark.operators.cuckoo import (
                    ShardedCuckooFilter,
                    build_sharded_cuckoo,
                )

                shards = (
                    bloom.shape[1] if bloom is not None else cfg.bloom_banks
                )
                if not res.scheduled:
                    return bloom if bloom is not None else (
                        ShardedCuckooFilter.sized(cfg.bloom_capacity, shards)
                    )
                wave_ck = build_sharded_cuckoo(
                    seen_delta, "url_hash",
                    capacity=cfg.bloom_capacity, n_shards=shards,
                )
                if bloom is not None and bloom.shape != wave_ck.shape:
                    raise ValueError(
                        f"resumed cuckoo shape {bloom.shape} incompatible "
                        f"with cfg bloom_capacity={cfg.bloom_capacity}/"
                        f"bloom_banks={cfg.bloom_banks} → {wave_ck.shape}; "
                        f"resume with the original filter config"
                    )
                return bloom.merge(wave_ck) if bloom is not None else wave_ck
            banks = (
                bloom.shape[0] if bloom is not None else cfg.bloom_banks
            )
            if not res.scheduled:
                if bloom is not None:
                    return bloom
                if banks > 1:
                    return BankedBloomFilter.sized(
                        cfg.bloom_capacity, cfg.bloom_fpp, banks
                    )
                return BloomFilter.sized(cfg.bloom_capacity, cfg.bloom_fpp)
            if banks > 1:
                wave_bloom = build_banked_bloom(
                    seen_delta, "url_hash",
                    capacity=cfg.bloom_capacity, fpp=cfg.bloom_fpp,
                    n_banks=banks,
                )
            else:
                wave_bloom = build_bloom(
                    seen_delta, "url_hash",
                    capacity=cfg.bloom_capacity, fpp=cfg.bloom_fpp,
                )
            if bloom is not None and bloom.shape != wave_bloom.shape:
                raise ValueError(
                    f"resumed Bloom shape {bloom.shape} (banks, bits/bank, "
                    f"k) is incompatible with cfg bloom_capacity="
                    f"{cfg.bloom_capacity}/fpp={cfg.bloom_fpp} → "
                    f"{wave_bloom.shape}; resume with the original Bloom "
                    f"config"
                )
            return bloom.merge(wave_bloom) if bloom is not None else wave_bloom

        # Final wave (no checkpointing): the loop cannot continue, so
        # materializing the next frontier, re-laying-out seen for a
        # future anti-join, and folding the Bloom are pure throwaway
        # work — measured at >50% of the final wave's wall time at 6M
        # URLs. seen stays a lazy union (consumers force it on
        # demand); retried/expanded stay -1 (unknown without running
        # the expansion join). The checkpoint path never skips: a
        # committed final frontier is what makes `resume` with a
        # higher max_waves budget possible.
        is_final = wave == cfg.max_waves - 1 and not cfg.ckpt_dir

        if cfg.ckpt_dir:
            bloom = _build_wave_bloom()
            ckpt.commit_wave(
                cfg.ckpt_dir, wave, next_frontier, seen_delta, bloom.to_bytes(),
                metrics=None,  # committed below, after counts
                part_metrics=res.part_metrics,
            )
            # lineage truncation: next wave reads back from disk
            frontier = ckpt.read_frontier(spark, cfg.ckpt_dir, wave)
            seen = ckpt.read_seen(spark, cfg.ckpt_dir, wave)
        elif is_final:
            seen = (
                seen.unionByName(seen_delta) if seen is not None else seen_delta
            )
            frontier = None
            nf_n, retried_n = 0, None
        else:
            t_ck = time.time()
            # Three independent materialization jobs close the wave:
            # (A) Bloom partial-build over the delta, (B) seen
            # accumulate + lineage truncation, (C) next-frontier
            # truncation (+ piggybacked metrics via observe — no
            # separate count job). All three read only the wave's
            # caches, so they run CONCURRENTLY from driver threads:
            # the FIFO scheduler interleaves their stages and the
            # parallelism-independent stage-launch latency is paid
            # once (max of three) instead of serially (sum of three).
            from concurrent.futures import ThreadPoolExecutor

            from pyspark.sql import Observation

            def _seen_job() -> DataFrame:
                new_seen = (
                    seen.unionByName(seen_delta)
                    if seen is not None
                    else seen_delta
                )
                # Keep the seen table hash-partitioned AND sorted on
                # url_hash (localCheckpoint preserves both): every
                # later wave's exact anti-join then shuffles/sorts
                # ONLY its (Bloom-shrunk) probe side — the growing
                # seen side stays in place. Production analog: the
                # seen Iceberg table PARTITIONED BY bucket(url_hash),
                # storage-partitioned join.
                return (
                    new_seen.repartition(parts, "url_hash")
                    .sortWithinPartitions("url_hash")
                    .localCheckpoint()
                )

            def _frontier_job() -> tuple[DataFrame, int, int]:
                obs = Observation()
                fr = next_frontier.observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("dont_filter").cast("long")).alias("retried"),
                ).localCheckpoint()
                return fr, obs.get["n"], obs.get["retried"]

            def _timed(name, fn):
                def _run():
                    ts = time.time()
                    try:
                        return fn()
                    finally:
                        _t(f"    tail job {name}", ts)
                return _run

            # Backoff's lazy host_stats localCheckpoint must
            # materialize WHILE res.fetched is still cached: deferring
            # to the next wave's backoff_plan jobs (its first natural
            # action) lands after the unpersists below, silently
            # re-executing this wave's admission/schedule/fetch chain
            # once per wave. One narrow count over the cached fold —
            # concurrent with the other tail jobs, so its stage-launch
            # latency hides under theirs.
            hs_force = (
                host_stats
                if cfg.backoff and host_stats is not None
                else None
            )
            with ThreadPoolExecutor(max_workers=4) as pool:
                f_bloom = pool.submit(_timed("bloom", _build_wave_bloom))
                f_seen = pool.submit(_timed("seen", _seen_job))
                f_frontier = pool.submit(_timed("frontier", _frontier_job))
                f_hs = (
                    pool.submit(_timed("host_stats", hs_force.count))
                    if hs_force is not None
                    else None
                )
                bloom = f_bloom.result()
                seen = f_seen.result()
                frontier, nf_n, retried_n = f_frontier.result()
                if f_hs is not None:
                    f_hs.result()
            _t("  bloom+seen+frontier ckpt (parallel)", t_ck)

        if cfg.ckpt_dir:
            # the parquet write materialized the frontier; one cheap
            # re-read agg on the committed files
            nf_n, retried_n = frontier.agg(
                F.count(F.lit(1)), F.sum(F.col("dont_filter").cast("long"))
            ).first()
        frontier_n = int(nf_n)
        if bo is not None:
            # the wave's backoff dim is fully consumed (quarantine
            # anti-join, eff_delays, max_eff) once the frontier/seen/
            # bloom tail jobs above have materialized — release it so
            # cached dims don't accumulate one-per-wave on long crawls
            bo.unpersist()
        if res.candidates is not None:
            res.candidates.unpersist()  # next frontier is materialized now
        if not cfg.keep_wave_caches and res.fetched is not None:
            # all consumers (metrics agg, checkpoint, part_metrics) have
            # run; release the wave's payload cache so executor storage
            # stays O(1) in wave count on long crawls
            res.fetched.unpersist()
            res.fetched = None
            res.parsed = None
        if not is_final:
            res.retried = int(retried_n or 0)
            res.expanded = int(nf_n) - res.retried
        res.wall_s = time.time() - t_wave
        _t(f"wave {wave} (sched={res.scheduled})", t_wave)

        if cfg.ckpt_dir:
            ckpt.write_metrics(
                cfg.ckpt_dir,
                wave,
                {
                    "wave": wave,
                    "scheduled": res.scheduled,
                    "hits": res.hits,
                    "misses": res.misses,
                    "retried": res.retried,
                    "expanded": res.expanded,
                    "parsed_docs": res.parsed_docs,
                    "next_start_ts": res.next_start_ts,
                },
            )

    if own_layout:
        pages_kv.unpersist()
    if links_kv is not None and links_prepped is None:
        links_kv.unpersist()
    if rmap is not None:
        rmap.unpersist()
    out.seen = seen
    if fetch_logs:
        log = fetch_logs[0]
        for extra in fetch_logs[1:]:
            log = log.unionByName(extra)
        out.fetch_log = log
    if parsed_frames:
        p = parsed_frames[0]
        for extra in parsed_frames[1:]:
            p = p.unionByName(extra)
        out.parsed = p
    return out
