"""Per-host adaptive backoff + circuit breaker from observed fetch
outcomes — the error-rate escalation every production crawler runs
(Heritrix's connect-failure backoff, Scrapy's AutoThrottle family):
a host that keeps failing gets slowed down first and cut off second,
so a dead or hostile site cannot burn the crawl's politeness budget
wave after wave.

Reference behavior: the reference crawler retries failed requests a
bounded number of times (SURVEY F7) but has no per-host escalation;
this operator adds the distributed version as crawl-loop policy
(``CrawlConfig.backoff``), composing with the existing per-host
Crawl-delay dim (robots F4) — backoff MULTIPLIES the host's base
delay rather than replacing it.

Scale shape: everything is bounded by the number of distinct hosts,
never by URLs. Per wave: one map-side-partial groupBy over the wave's
(already cached) fetch frame, a host-keyed fold of the cumulative
stats table (<= hosts rows), and one broadcast anti-join of the
frontier against the quarantine set — zero full-frontier exchanges
added.

Decision rules — ALL integer cross-multiplications (the engine's
cross-engine float protocol), evaluated on CUMULATIVE per-host
counters, so they are pure functions of the stats table and
deterministic under any partitioning:

- backed-off:  sched >= min_fetches AND miss·100 >= err_pct·sched
  → effective delay = host's base delay × factor
- quarantined: sched >= min_fetches AND miss·100 >= quarantine_pct·sched
  → the host's candidates (fresh AND retries) are dropped at wave
  admission. This deliberately supersedes the "retries are never
  dropped" contract: quarantine is precisely the judgment that the
  host is dead and further retries are waste. Set
  quarantine_pct >= err_pct (quarantine implies backed-off).

The python simulator implements the identical rules
(plans/simulator.py) — the full-crawl parity test is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_host_stats(
    prev: DataFrame | None, wave_fetched: DataFrame, probe_col: str
) -> DataFrame:
    """Cumulative ``(host, sched, miss)`` after a wave: one bounded
    groupBy over the wave's cached fetch frame, host-keyed fold into
    the running table. Caller materializes (localCheckpoint) — the
    table is <= hosts rows and must not chain wave lineage."""
    w = wave_fetched.groupBy("host").agg(
        F.count(F.lit(1)).alias("sched"),
        (F.count(F.lit(1)) - F.count(probe_col)).alias("miss"),
    )
    if prev is None:
        return w
    return (
        prev.unionByName(w)
        .groupBy("host")
        .agg(F.sum("sched").alias("sched"), F.sum("miss").alias("miss"))
    )


def backoff_plan(
    stats: DataFrame,
    base_delay_s: float,
    host_delays: DataFrame | None = None,
    min_fetches: int = 4,
    err_pct: int = 50,
    factor: int = 4,
    quarantine_pct: int = 90,
) -> DataFrame:
    """``(host, crawl_delay, quarantined)`` — the effective per-host
    policy dim for the NEXT wave, folding the robots Crawl-delay dim
    (full outer join: dim-only hosts keep their delay, stat-only
    hosts derive from the default).

    Compact by construction: rows that would repeat the default
    (delay == base, not quarantined) are dropped, so the dim stays
    broadcast-sized. The caller feeds ``crawl_delay`` straight into
    ``schedule_wave(host_delays=...)`` and anti-joins the frontier on
    the quarantined hosts."""
    if min_fetches < 1 or factor < 1:
        raise ValueError("min_fetches and factor must be >= 1")
    if not (0 < err_pct <= 100 and 0 < quarantine_pct <= 100):
        raise ValueError("err_pct/quarantine_pct must be in (0, 100]")
    eligible = F.col("sched") >= min_fetches
    backed = eligible & (
        F.col("miss") * 100 >= F.lit(err_pct) * F.col("sched")
    )
    quar = eligible & (
        F.col("miss") * 100 >= F.lit(quarantine_pct) * F.col("sched")
    )
    s = stats.select("host", backed.alias("_b"), quar.alias("_q"))
    if host_delays is not None:
        s = s.join(
            host_delays.select("host", "crawl_delay"), "host", "full"
        )
    else:
        s = s.withColumn("crawl_delay", F.lit(None).cast("double"))
    base = F.coalesce(F.col("crawl_delay"), F.lit(float(base_delay_s)))
    out = s.select(
        "host",
        F.when(
            F.coalesce(F.col("_b"), F.lit(False)), base * factor
        )
        .otherwise(base)
        .alias("crawl_delay"),
        F.coalesce(F.col("_q"), F.lit(False)).alias("quarantined"),
    )
    return out.filter(
        F.col("quarantined")
        | (F.col("crawl_delay") != F.lit(float(base_delay_s)))
    )


def backoff_python(
    stats: dict[str, tuple[int, int]],
    base_delay_s: float,
    host_delays: dict[str, float] | None = None,
    min_fetches: int = 4,
    err_pct: int = 50,
    factor: int = 4,
    quarantine_pct: int = 90,
) -> tuple[dict[str, float], set[str]]:
    """Simulator twin of :func:`backoff_plan` — identical integer
    rules over ``{host: (sched, miss)}``. Returns the effective delay
    map (dim ∪ backoff-modified hosts, default rows omitted) and the
    quarantine set."""
    eff = dict(host_delays or {})
    quarantined: set[str] = set()
    for host, (sched, miss) in stats.items():
        if sched < min_fetches:
            continue
        base = (host_delays or {}).get(host, base_delay_s)
        if miss * 100 >= err_pct * sched:
            eff[host] = base * factor
        if miss * 100 >= quarantine_pct * sched:
            quarantined.add(host)
    return eff, quarantined
