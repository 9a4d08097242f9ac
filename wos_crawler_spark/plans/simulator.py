"""Single-threaded reference-semantics simulator (SURVEY.md §4/§5.2-2).

The determinism oracle: replays the exact contract the engine
implements — seed matching, robots longest-prefix-match, seen-set
dedup with retry bypass, per-host priority quota, salted token-bucket
scheduling, retries, link expansion — in plain Python over pandas
inputs. Tests assert the engine's fetch log (ordered by the data-
derived key) and final seen set equal this replay bit-for-bit, which
is what "matching the reference's crawl ordering and URL-seen set"
(north_rule) means operationally with an empty reference tree
(SURVEY §0): Scrapy's scheduler for this spider degenerates to
seed-order × page-order, i.e. exactly this data-derived total order.

``url_meta`` maps url → (url_canon, url_hash, host); hashes are
xxhash64 values computed once by Spark (the sim never re-hashes).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class SimFetch:
    wave: int
    url: str
    url_hash: int
    host: str
    scheduled_ts: float
    hit: bool


@dataclass
class SimResult:
    fetches: list[SimFetch] = field(default_factory=list)
    seen: set[int] = field(default_factory=set)

    def order_key(self, f: SimFetch):
        return (f.wave, f.scheduled_ts, f.host, f.url_hash)

    @property
    def fetch_order(self) -> list[tuple]:
        return [
            (f.wave, f.url, round(f.scheduled_ts, 6))
            for f in sorted(self.fetches, key=self.order_key)
        ]


def _robots_allows(path: str, rules: list[tuple[str, bool, int]]) -> bool:
    matched = [(ln, allow) for (pref, allow, ln) in rules if path.startswith(pref)]
    if not matched:
        return True
    # longest rule wins (ties broken by allow to mirror struct sort —
    # identical-length matching prefixes are identical strings anyway)
    return max(matched)[1]


def _compile_robots_pattern(p: str) -> "re.Pattern":
    """Python twin of robots.compile_robots_pattern (RFC 9309 * / $):
    escape everything, un-escape the two RFC constructs, anchor at
    start. re.escape's output for these constructs matches the
    engine's escape class on the characters that matter."""
    import re

    esc = re.escape(p)
    esc = esc.replace(r"\*", ".*")
    if esc.endswith(r"\$"):
        esc = esc[:-2] + "$"
    return re.compile("^" + esc)


def _robots_allows_rfc(path: str, rules: list[tuple[str, bool, int]]) -> bool:
    """RFC-9309 wildcard twin: longest matching pattern wins, ties →
    allow (least restrictive), no match → allow."""
    matched = [
        (ln, allow)
        for (pat, allow, ln) in rules
        if _compile_robots_pattern(pat).match(path)
    ]
    if not matched:
        return True
    return max(matched)[1]


def simulate_crawl(
    pages_urls: set[str],
    page_texts: dict[str, str],
    seeds: list[tuple[int, str, int]],  # (query_id, term, priority)
    links: dict[str, list[str]],
    robots: dict[str, list[tuple[str, bool, int]]],  # host → [(prefix, allow, len)]
    url_meta: dict[str, tuple[str, int, str]],  # url → (canon, hash, host)
    delay_s: float = 1.0,
    quota: int | None = None,
    max_waves: int = 4,
    max_depth: int = 3,
    max_retries: int = 2,
    rows_per_bucket: int = 10_000,
    host_delays: dict[str, float] | None = None,
    robots_wildcards: bool = False,
    trap_cap: int | None = None,
    trap_keep: int | None = None,
    url_gate: bool = False,
    url_gate_kwargs: dict | None = None,
    backoff: bool = False,
    backoff_kwargs: dict | None = None,
    politeness_domain: bool = False,
    domain_map: dict[str, str] | None = None,
    redirect_edges: dict[str, str] | None = None,
    redirect_max_hops: int = 8,
    opic_priority: bool = False,
    opic_iters: int = 3,
    opic_scale: int = 1_000_000,
) -> SimResult:
    res = SimResult()
    robots_allows = _robots_allows_rfc if robots_wildcards else _robots_allows

    # Redirect twin (engine: resolve_redirects + rewrite at frontier
    # entry): resolve every chain by direct walking — an independent
    # restatement of the engine's path doubling. Resolved sources map
    # to their landing url; cycles/over-cap sources are refused.
    rd_final: dict[str, str] = {}
    rd_refused: set[str] = set()
    if redirect_edges:
        for src in redirect_edges:
            cur, hops = src, 0
            while cur in redirect_edges and hops < redirect_max_hops:
                cur = redirect_edges[cur]
                hops += 1
            if cur in redirect_edges:
                rd_refused.add(src)
            else:
                rd_final[src] = cur

    def via_redirects(url: str) -> str | None:
        """Landing url for a candidate (None = refused). Keyed by the
        candidate's CANONICAL url, like the engine's rewrite join."""
        canon = url_meta[url][0]
        if canon in rd_refused:
            return None
        return rd_final.get(canon, url)

    # frontier rows: dicts with the engine's FRONTIER_COLS semantics
    def row(url, qid, prio, depth, wave, attempt, dont_filter, lineage):
        canon, uhash, host = url_meta[url]
        return {
            "url": url,
            "url_canon": canon,
            "url_hash": uhash,
            "host": host,
            "priority": prio,
            "depth": depth,
            "discovered_wave": wave,
            "attempt": attempt,
            "dont_filter": dont_filter,
            "query_id": qid,
            "lineage": lineage,
        }

    frontier = [
        row(landed, qid, prio, 0, 0, 0, False, f"seed:{qid}")
        for url in sorted(page_texts)
        for (qid, term, prio) in seeds
        if term in page_texts[url]
        and (landed := via_redirects(url)) is not None
    ]

    wave_start = 0.0
    host_stats: dict[str, list] = {}  # host -> [sched, miss]
    # opic_priority twin: cumulative (canon(src), canon(dst)) edges
    # observed from every fetched HIT's outlinks — raw-dst canon
    # (redirect-blind), exactly the engine's edge definition
    opic_edges: set[tuple[str, str]] = set()
    for wave in range(max_waves):
        if not frontier:
            break
        # scheduling key: raw host, or eTLD+1 when politeness_domain
        # (the engine's scheduling-unit rewrite; robots and the
        # recorded fetches keep the TRUE host). Backoff keys its
        # stats/delays/quarantine through the SAME key.
        skey = (
            (lambda h: (domain_map or {}).get(h, h))
            if politeness_domain
            else (lambda h: h)
        )
        # per-key backoff policy from cumulative prior-wave stats —
        # the twin of run_crawl's backoff_plan application (identical
        # integer rules via backoff_python): quarantined keys drop
        # at admission (fresh AND retries), backed-off keys get
        # delay x factor in the token bucket and the wave gap.
        eff_delays = dict(host_delays or {})
        if backoff and host_stats:
            from wos_crawler_spark.operators.backoff import backoff_python

            eff_delays, quarantined = backoff_python(
                {h: tuple(v) for h, v in host_stats.items()},
                delay_s, host_delays, **(backoff_kwargs or {}),
            )
            frontier = [
                r for r in frontier
                if skey(r["host"]) not in quarantined
            ]
        # F3 robots
        allowed = []
        for r in frontier:
            path = r["url_canon"].split("://", 1)[1]
            path = "/" + path.split("/", 1)[1] if "/" in path else "/"
            if robots_allows(path, robots.get(r["host"], [])):
                allowed.append(r)
        # F1 seen-dedup (retry rows bypass). Intra-wave dedup happens
        # INSIDE the engine's politeness shuffle (schedule_wave
        # dedup_intra), so the salt-count pool here keeps intra-wave
        # duplicate copies — S(host) derives from the pre-dedup
        # multiset, mirroring the engine exactly.
        # F1h URL-level quality gate: fresh candidates only (retries
        # bypass, like F1) — the python twin of url_keep_expr over
        # the canonical url.
        if url_gate:
            from wos_crawler_spark.operators.urlgate import (
                url_gate_python,
            )

            allowed = [
                r
                for r in allowed
                if r["dont_filter"]
                or url_gate_python(
                    r["url_canon"], **(url_gate_kwargs or {})
                )
            ]
        # F1g trap guard: fresh candidates only (retries bypass, like
        # F1) — a shape with more than trap_cap distinct canon urls
        # keeps rows whose canon is among its trap_keep smallest.
        if trap_cap is not None:
            from wos_crawler_spark.operators.trapguard import (
                url_shape_python,
            )

            keep_n = trap_cap if trap_keep is None else trap_keep
            by_shape: dict[str, set] = {}
            for r in allowed:
                if not r["dont_filter"]:
                    by_shape.setdefault(
                        url_shape_python(r["url_canon"]), set()
                    ).add(r["url_canon"])
            kept_canons = {
                s: set(sorted(canons)[:keep_n])
                for s, canons in by_shape.items()
                if len(canons) > trap_cap
            }
            allowed = [
                r
                for r in allowed
                if r["dont_filter"]
                or (s := url_shape_python(r["url_canon"])) not in kept_canons
                or r["url_canon"] in kept_canons[s]
            ]

        pool = []
        for r in allowed:
            if r["dont_filter"] or r["url_hash"] not in res.seen:
                pool.append(r)

        # politeness salting from PRE-dedup, pre-quota per-key counts
        host_counts: dict[str, int] = {}
        for r in pool:
            k = skey(r["host"])
            host_counts[k] = host_counts.get(k, 0) + 1
        n_buckets = {
            h: max(1, math.ceil(c / rows_per_bucket)) for h, c in host_counts.items()
        }

        # intra-wave dedup with the deterministic representative key
        fresh = {}
        bypass = []
        for r in pool:
            if r["dont_filter"]:
                bypass.append(r)
                continue
            k = r["url_hash"]
            rep_key = (-r["priority"], r["query_id"], r["lineage"])
            if k not in fresh or rep_key < fresh[k][0]:
                fresh[k] = (rep_key, r)
        candidates = [v[1] for v in fresh.values()] + bypass

        # W1 quota: per-scheduling-key top-k by the deterministic key
        order_key = lambda r: (-r["priority"], r["discovered_wave"], r["url_hash"])
        by_host: dict[str, list] = {}
        for r in candidates:
            by_host.setdefault(skey(r["host"]), []).append(r)
        scheduled, overflow = [], []
        for hrows in by_host.values():
            hrows.sort(key=order_key)
            take = hrows if quota is None else hrows[:quota]
            overflow.extend([] if quota is None else hrows[quota:])
            scheduled.extend(take)

        # token bucket: ts = wave_start + (salt + p·S)·delay
        max_ts = None
        this_wave: list[SimFetch] = []
        for host, hrows in by_host.items():
            # `host` here is the SCHEDULING key (domain in domain mode)
            S = n_buckets[host]
            d = eff_delays.get(host, delay_s)
            take = hrows if quota is None else hrows[:quota]
            buckets: dict[int, list] = {}
            for r in take:
                buckets.setdefault(r["url_hash"] % S, []).append(r)
            for salt, brows in buckets.items():
                brows.sort(key=order_key)
                for p, r in enumerate(brows):
                    ts = wave_start + (salt + p * S) * d
                    max_ts = ts if max_ts is None else max(max_ts, ts)
                    hit = r["url"] in pages_urls
                    this_wave.append(
                        SimFetch(
                            wave, r["url"], r["url_hash"], r["host"],
                            ts, hit,
                        )
                    )
                    res.seen.add(r["url_hash"])
                    r["_hit"] = hit
        res.fetches.extend(this_wave)
        if backoff:
            for f in this_wave:
                st = host_stats.setdefault(skey(f.host), [0, 0])
                st[0] += 1
                if not f.hit:
                    st[1] += 1
        if max_ts is not None:
            # engine twin: conservative gap = max over all effective
            # delays (run_crawl's inter_wave_gap)
            gap = max([delay_s, *eff_delays.values()])
            wave_start = max_ts + gap

        # next frontier: expansions + retries + quota overflow
        nxt = []
        for r in scheduled:
            if r.get("_hit"):
                if opic_priority:
                    # edges accumulate for EVERY hit (depth-blind,
                    # like the engine's hit_log ⋈ links join)
                    for dst in links.get(r["url"], []):
                        opic_edges.add((r["url_canon"], url_meta[dst][0]))
                if r["depth"] + 1 <= max_depth:
                    for dst in links.get(r["url"], []):
                        landed = via_redirects(dst)
                        if landed is None:
                            continue
                        nxt.append(
                            row(
                                landed, r["query_id"], r["priority"],
                                r["depth"] + 1, wave + 1, 0, False,
                                f"link:{r['url']}",
                            )
                        )
            else:
                if r["attempt"] + 1 <= max_retries:
                    rr = dict(r)
                    rr["attempt"] += 1
                    rr["dont_filter"] = True
                    nxt.append(rr)
        nxt.extend(overflow)
        if opic_priority and opic_edges:
            from wos_crawler_spark.operators.linkgraph import (
                opic_int_python,
            )

            scores = opic_int_python(
                sorted(opic_edges), n_iter=opic_iters, scale=opic_scale
            )
            for r in nxt:
                if r["url_canon"] in scores:
                    r["priority"] = scores[r["url_canon"]]
        frontier = nxt
    return res
