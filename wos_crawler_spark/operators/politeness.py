"""Per-host politeness scheduler: salted repartition + token bucket
(SURVEY.md F4/W1/O1; north_rule: "salted-key repartition on host hash
to kill skew, token-bucket delay per partition").

Reference behavior: ``ref:wos_crawler/settings.py::DOWNLOAD_DELAY`` †
plus ``dep:scrapy.core.downloader::DownloaderSlot`` — min gap between
requests per host, enforced by a single-process event loop.

Spark-first design, skew-safe at 10^10 rows:

- **Salting**: each host gets S(host) buckets
  (``salt = pmod(url_hash, S)``), S proportional to the host's
  frontier share, so no window/group ever sees more than
  ~rows_per_bucket rows. There is NO host-wide window anywhere — a
  hot host (30% of the frontier) never serializes through one task.
- **Priority quota (W1)** is two-phase: bucket-local ``row_number ≤
  quota`` first (a superset of the host top-k, computed in salted —
  skew-free — windows), then the exact host top-k over the surviving
  ≤ S·quota rows per host. The expensive window runs only on the
  pre-shrunk set.
- **Token bucket**: bucket ``b`` schedules its p-th fetch at
  ``wave_start + (b + p·S) · delay``. For two distinct fetches of one
  host, ``|Δb + S·Δp| ≥ 1`` with ``|Δb| < S``, so every inter-fetch
  gap is ≥ delay: the per-host rate is EXACTLY the unsalted rate
  while the work spreads across S parallel groups (SURVEY §7.3).
- **Determinism contract (SURVEY §4)**: all ordering derives from the
  data key (priority desc, discovered_wave, url_hash) — never from
  arrival/partition order, so local[8] ≡ local[32] bit-for-bit. The
  wave's fetch order is DEFINED as sort by
  (scheduled_ts, host, url_hash); tests materialize it with a small
  orderBy, production never needs a global sort (O1).

Everything here is window/join exprs — zero Python in the hot path;
``spark.speculation`` must stay off for these stages (duplicate
fetches would break the politeness invariant — SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def order_cols():
    """Deterministic intra-host ordering key (SURVEY §4)."""
    return [
        F.col("priority").desc(),
        F.col("discovered_wave").asc(),
        F.col("url_hash").asc(),
    ]

#: The wave-global fetch-order key (tests sort by this; production
#: processes buckets independently in scheduled order).
FETCH_ORDER_COLS = ["scheduled_ts", "host", "url_hash"]


def salt_counts(frontier: DataFrame, rows_per_bucket: int) -> DataFrame:
    """A3: per-host pending counts → bucket count S(host). One tiny
    aggregate row per host (broadcastable)."""
    return frontier.groupBy("host").agg(
        F.count(F.lit(1)).alias("pending"),
        F.greatest(
            F.lit(1), F.ceil(F.count(F.lit(1)) / rows_per_bucket).cast("int")
        ).alias("n_buckets"),
    )


def schedule_wave(
    frontier: DataFrame,
    delay_s: float,
    wave_start: float = 0.0,
    quota: int | None = None,
    rows_per_bucket: int = 10_000,
    dedup_intra: bool = False,
    host_delays: DataFrame | None = None,
    broadcast_dims: bool = True,
) -> DataFrame:
    """Assign politeness ``scheduled_ts`` to this wave's frontier,
    after the optional per-host priority quota (W1).

    Input needs (host, url_hash, priority, discovered_wave); output
    adds (salt, n_buckets, scheduled_ts).

    ``host_delays`` — optional ``(host, crawl_delay)`` dim (e.g. from
    robots.txt ``Crawl-delay`` via
    :func:`~wos_crawler_spark.operators.robots.parse_robots_delays`);
    a listed host's token bucket runs at ITS delay, everyone else at
    ``delay_s``. Broadcast-joined by default — a per-host dim is
    O(hosts), never a frontier-scale shuffle. The bucket math is
    unchanged: delay is constant per host, so the ≥delay inter-fetch
    gap proof in the module docstring still holds verbatim.

    ``broadcast_dims=False`` drops the broadcast hints on BOTH
    per-host dims (the salt-count dim and ``host_delays``) for
    frontiers spanning more hosts than broadcast can carry (10^7+):
    the dim joins then key on host — bounded exchanges that ride the
    same hash partitioning as the politeness shuffle — and AQE may
    still convert them back to broadcast from runtime stats.
    run_crawl derives the verdict from CrawlConfig.
    dim_broadcast_threshold; scheduling output is identical either
    way (parity-tested).

    ``dedup_intra=True`` folds intra-wave url_hash dedup INTO this
    operator's (host, salt) shuffle: because equal hashes imply equal
    (host, salt), duplicate candidates are adjacent under a
    within-partition sort by url_hash, so a lag() comparison drops
    them with NO extra exchange — one full-frontier shuffle instead
    of two per wave (``dont_filter`` retry rows are never dropped,
    like Scrapy's Request.dont_filter). Representative choice stays
    the deterministic rep-order key (SURVEY §4). With this on, the
    salt-count pass necessarily sees the pre-dedup multiset — the
    bucket count S(host) is a layout knob, so only the simulator
    contract needs to mirror that (plans/simulator.py does)."""
    counts = salt_counts(frontier, rows_per_bucket).select("host", "n_buckets")
    delays = (
        host_delays.select("host", "crawl_delay")
        if host_delays is not None
        else None
    )
    if broadcast_dims:
        counts = F.broadcast(counts)
        delays = F.broadcast(delays) if delays is not None else None
    f = frontier.join(counts, "host", "left")
    if delays is not None:
        f = f.join(delays, "host", "left")
    f = f.withColumn("salt", F.pmod(F.col("url_hash"), F.col("n_buckets")).cast("int"))

    w_bucket = Window.partitionBy("host", "salt").orderBy(*order_cols())

    if dedup_intra:
        # fresh rows first per hash (rep-order picks the survivor),
        # dont_filter rows after (kept unconditionally)
        w_dedup = Window.partitionBy("host", "salt").orderBy(
            F.col("url_hash").asc(),
            F.col("dont_filter").asc(),
            F.col("priority").desc_nulls_last(),
            F.col("query_id").asc_nulls_last(),
            F.col("lineage").asc_nulls_last(),
        )
        f = (
            f.withColumn("_prev_hash", F.lag("url_hash").over(w_dedup))
            .filter(
                F.col("dont_filter")
                | F.col("_prev_hash").isNull()
                | (F.col("_prev_hash") != F.col("url_hash"))
            )
            .drop("_prev_hash")
        )

    if quota is not None:
        # phase 1: skew-free superset (any host-top-k row is in its
        # bucket's top-k); phase 2: exact top-k over ≤ S·quota rows.
        f = (
            f.withColumn("_bp", F.row_number().over(w_bucket))
            .filter(F.col("_bp") <= quota)
            .drop("_bp")
        )
        w_host = Window.partitionBy("host").orderBy(*order_cols())
        f = (
            f.withColumn("_hr", F.row_number().over(w_host))
            .filter(F.col("_hr") <= quota)
            .drop("_hr")
        )

    # token bucket per (host, salt): position p → (salt + p·S)·delay
    delay = (
        F.coalesce(F.col("crawl_delay"), F.lit(float(delay_s)))
        if host_delays is not None
        else F.lit(float(delay_s))
    )
    f = f.withColumn("_p", F.row_number().over(w_bucket) - 1)
    f = f.withColumn(
        "scheduled_ts",
        F.lit(float(wave_start))
        + (F.col("salt") + F.col("_p") * F.col("n_buckets")) * delay,
    ).drop("_p")
    if host_delays is not None:
        f = f.drop("crawl_delay")

    # executors process each bucket in schedule order (no global sort).
    # The window above already hash-partitioned the data on (host, salt)
    # — adding an explicit repartition here would force a second full
    # shuffle of the frontier for an identical partitioning, so we only
    # sort within the partitions the window left behind.
    return f.sortWithinPartitions("scheduled_ts")
