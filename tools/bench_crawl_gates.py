"""Per-gate crawl-cost ledger (VERDICT r3 item 1's attribution half):
time the bench crawl workload with each round-3 admission gate toggled
on individually against the all-off baseline, same session, same
prepared join sides — so the cost of url-gate / trap-guard / backoff /
domain-politeness / robots-wildcards is a measured number, not a
bisection. Writes BENCH/CRAWL_GATES.md.

Usage: python tools/bench_crawl_gates.py [--n 200000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.bench_scaling import _cpu_probe, _fresh_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.plans.crawl import (
        CrawlConfig,
        prepare_fetch_side,
        prepare_links_side,
        run_crawl,
    )

    spark = _fresh_spark(args.cores)
    n = args.n
    pages = pages_table(spark, n, partitions=args.cores * 2).persist()
    pages.count()
    links = links_table(spark, n, partitions=args.cores)
    pages_fetch = prepare_fetch_side(pages, args.cores, with_text=False)
    pages_fetch.count()
    links_kv = prepare_links_side(links, args.cores)
    links_kv.count()
    # warm python workers (one-time)
    spark.range(args.cores * 4, numPartitions=args.cores * 4).mapInPandas(
        lambda it: it, "id long"
    ).count()

    base = dict(
        delay_s=0.001, max_waves=3, parse=False, rows_per_bucket=5_000,
        bloom_capacity=2 * n, bloom_prefilter=False,
    )
    variants = {
        "baseline_all_off": {},
        # the synthetic /rec/00000001 urls are digit-heavy by design
        # and the gate's default 1/2 digit-ratio correctly drops ALL
        # of them (verified — the gate working as built); relax the
        # ratio here so the ledger measures the gate's COST on a
        # surviving frontier, not an empty crawl
        "url_gate": {
            "url_gate": True,
            "url_gate_kwargs": {"max_digit_num": 4, "max_digit_den": 5},
        },
        "trap_guard": {"trap_cap": 50_000},
        "backoff": {"backoff": True},
        "politeness_domain": {"politeness_domain": True},
        "robots_wildcards": {"robots_wildcards": True},
    }
    # round-5 additions: the FULL-PSL scheduling key (Arrow pass over
    # the ~9k-rule fixture — vs politeness_domain's literal-subset HOF
    # expr, the r4 open question) and score-driven OPIC priority
    from wos_crawler_spark.operators.blocklist import synth_psl_rules

    variants["politeness_domain_psl"] = {
        "politeness_domain": True,
        "psl_rules": tuple(synth_psl_rules()),
    }
    variants["opic_priority"] = {"opic_priority": True}

    results: dict[str, dict] = {}
    for name, extra in variants.items():
        best = None
        for _ in range(args.reps):
            probe = round(_cpu_probe(), 3)
            t0 = time.time()
            res = run_crawl(
                spark, pages=pages, seeds=seeds_table(spark), links=links,
                robots=robots_table(spark),
                cfg=CrawlConfig(**{**base, **extra}),
                pages_fetch=pages_fetch, links_prepped=links_kv,
            )
            scheduled = sum(w.scheduled for w in res.waves)
            res.fetch_log.agg(F.count(F.lit(1))).first()
            dt = time.time() - t0
            if best is None or dt < best["sec"]:
                best = {
                    "sec": round(dt, 2),
                    "urls_per_sec": round(scheduled / dt, 1),
                    "scheduled": scheduled,
                    "probe": probe,
                }
        results[name] = best
        print(json.dumps({name: best}), flush=True)

    b = results["baseline_all_off"]
    lines = [
        "# Crawl per-gate cost ledger (rounds 4-5)",
        "",
        f"Workload: the bench crawl ({args.n} pages, 3 waves, parse off,",
        f"local[{args.cores}], prepared join sides, best-of-{args.reps}",
        "per variant, one session). Each row toggles ONE gate on against",
        "the all-off baseline — the measured cost of the round-3 wave-",
        "loop additions, complementing the runtime admission-funnel",
        "counters (CrawlResult.gate_report()).",
        "",
        "| variant | sec | urls/s | Δ vs baseline | probe |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        delta = (
            "—" if name == "baseline_all_off"
            else f"{(r['sec'] - b['sec']) / b['sec'] * 100:+.1f}%"
        )
        lines.append(
            f"| {name} | {r['sec']} | {r['urls_per_sec']} | {delta} "
            f"| {r['probe']} |"
        )
    lines.append("")
    out = Path(__file__).resolve().parents[1] / "BENCH" / "CRAWL_GATES.md"
    out.write_text("\n".join(lines))
    print(f"# wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
