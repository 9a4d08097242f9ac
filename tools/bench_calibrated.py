"""Calibrated re-run of the round bench (VERDICT r3 item 1).

Runs ``python bench.py`` N times (default 3) as fresh subprocesses,
taking the scaling harness's fixed-work single-thread CPU probe
immediately before each run (this guest cannot see hypervisor CPU
steal; probes inflating >1.8x over the session's best flag a
co-tenant storm — the identical protocol to tools/bench_scaling.py).

Reports, per query: the median and best across all storm-free runs
(each bench.py run is itself a best-of-2 per query), plus the raw
values and every run's probe, and writes BENCH/CALIBRATED_<tag>.md.
The headline crawl/parse throughputs come from the best storm-free
run (min wall → max urls/s), the honest "engine signal" under
documented 1.5-3x co-tenant noise.

Usage: python tools/bench_calibrated.py [--repeats 3] [--tag r04]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _cpu_probe() -> float:
    import numpy as np

    a = np.arange(1_500_000, dtype=np.uint64)
    t0 = time.time()
    for _ in range(40):
        a = a * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
        a ^= a >> np.uint64(33)
    float(a[0])
    return time.time() - t0


def _run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(
        f"bench.py produced no JSON line (rc={out.returncode}):\n"
        + out.stdout[-2000:]
        + out.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tag", default="r04")
    args = ap.parse_args()

    runs: list[dict] = []
    for i in range(args.repeats):
        probe = round(_cpu_probe(), 3)
        t0 = time.time()
        res = _run_bench()
        res["_probe_s"] = probe
        res["_wall_s"] = round(time.time() - t0, 1)
        runs.append(res)
        print(
            f"# run {i}: probe={probe}s total={res['value']}s "
            f"crawl={res['queries']['crawl_wave_loop']}s "
            f"urls/s={res.get('crawl_urls_per_sec')}",
            flush=True,
        )

    best_probe = min(r["_probe_s"] for r in runs)
    clean = [r for r in runs if r["_probe_s"] <= 1.8 * best_probe]
    flagged = len(runs) - len(clean)

    qnames = sorted(runs[0]["queries"])
    med = {
        q: round(statistics.median(r["queries"][q] for r in clean), 3)
        for q in qnames
    }
    best = {q: min(r["queries"][q] for r in clean) for q in qnames}
    best_run = min(clean, key=lambda r: r["queries"]["crawl_wave_loop"])

    summary = {
        "metric": "calibrated_headline_suite_median",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "queries_best": best,
        "repeats": args.repeats,
        "storm_flagged_runs": flagged,
        "probes_s": [r["_probe_s"] for r in runs],
        "best_probe_s": best_probe,
        "crawl_urls_per_sec_best": best_run.get("crawl_urls_per_sec"),
        "parse_docs_per_sec_best": max(
            r.get("parse_docs_per_sec", 0) for r in clean
        ),
        "sig_vecs_per_sec_best": max(
            r.get("sig_vecs_per_sec", 0) for r in clean
        ),
        "dedup_index_probe_sec_best": min(
            r.get("dedup_index_probe_sec", 1e9) for r in clean
        ),
        "dedup_index_build_sec_best": min(
            r.get("dedup_index_build_sec", 1e9) for r in clean
        ),
        "sf": runs[0]["sf"],
        "cpus": runs[0]["cpus"],
    }
    print(json.dumps(summary))

    md = REPO / "BENCH" / f"CALIBRATED_{args.tag}.md"
    lines = [
        f"# Calibrated bench — {args.tag}",
        "",
        f"{args.repeats} full `bench.py` runs (each itself best-of-2 per",
        "query), fresh subprocess per run, the scaling harness's CPU probe",
        f"before each. Best probe {best_probe}s; probes {summary['probes_s']}",
        f"(>1.8x best = storm-flagged; {flagged} run(s) flagged).",
        "",
        f"- median suite total (storm-free runs): **{summary['value']}s**",
        f"- crawl urls/s (best storm-free): **{summary['crawl_urls_per_sec_best']}**",
        f"- parse docs/s (best storm-free): **{summary['parse_docs_per_sec_best']}**",
        f"- dedup-index probe (steady state): {summary['dedup_index_probe_sec_best']}s"
        f" (build: {summary['dedup_index_build_sec_best']}s)",
        "",
        "| query | median s | best s |",
        "|---|---|---|",
    ]
    for q in qnames:
        lines.append(f"| {q} | {med[q]} | {best[q]} |")
    lines.append("")
    lines.append("Raw runs (total s / probe s / crawl urls/s): " + ", ".join(
        f"{r['value']}/{r['_probe_s']}/{r.get('crawl_urls_per_sec')}"
        for r in runs
    ))
    lines.append("")
    md.write_text("\n".join(lines))
    print(f"# wrote {md}", flush=True)


if __name__ == "__main__":
    main()
