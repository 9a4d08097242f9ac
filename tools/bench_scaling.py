"""Two-parallelism scaling protocol (BASELINE.md / north_rule).

No real cluster exists in this sandbox, so the north rule's "N vs 4N
executors, efficiency >= 0.8" criterion is evidenced by running the SAME
job on the SAME input at local[8] and local[32] (8 vs 32 executor
threads, one JVM) and reporting throughput at both plus

    efficiency = (throughput_32 / throughput_8) / 4

for each north-star workload:

  * crawl  — frontier-expansion + fetch-schedule wave loop (URLs/sec)
  * parse  — vectorized WoS field-tag parse, byte-identity path (docs/sec)

Writes BENCH/BASELINE.md and prints one JSON line per run + a summary
line. Input size defaults to 400k pages so per-wave fixed driver costs
(job launch, checkpoint commits — parallelism-independent) amortize;
they are the same costs a real 1000-executor driver pays per wave.

Usage: python tools/bench_scaling.py [--n 400000] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CORE_LEVELS = (8, 32)


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    # new context per level: master/parallelism are context-bound.
    # tmpfs shuffle dir: this VM's root fs (ext4+discard on virtio)
    # serializes concurrent shuffle-file creates (observed via jstack:
    # executor threads parked in FileOutputStream.open0), which
    # penalizes higher thread counts; a real cluster gives each
    # executor its own disks. Pinned -Xms avoids heap-commit churn.
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"wcs-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.speculation", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", f"-Xms{mem}")
        .config("spark.local.dir", f"/dev/shm/wcs-scaling-{cores}")
        .getOrCreate()
    )


def run_crawl(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from wos_crawler_spark.fixtures.synth import (
        links_table,
        pages_table,
        robots_table,
        seeds_table,
    )
    from wos_crawler_spark.plans.crawl import CrawlConfig, run_crawl as _run

    cores = spark.sparkContext.defaultParallelism
    pages = pages_table(spark, n, partitions=cores * 2).persist()
    pages.count()  # input materialization excluded from the timing
    t0 = time.time()
    res = _run(
        spark,
        pages=pages,
        seeds=seeds_table(spark),
        links=links_table(spark, n, partitions=cores),
        robots=robots_table(spark),
        cfg=CrawlConfig(delay_s=0.001, max_waves=3, parse=False, rows_per_bucket=5_000),
    )
    scheduled = sum(w.scheduled for w in res.waves)
    fetched = res.fetch_log.agg(F.count(F.lit(1))).first()[0]
    dt = time.time() - t0
    pages.unpersist()
    return {
        "workload": "crawl",
        "sec": round(dt, 2),
        "items": scheduled,
        "throughput": round(scheduled / dt, 1),
        "unit": "urls/sec",
        "fetched_rows": fetched,
        "waves": [w.scheduled for w in res.waves],
    }


def run_parse(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from wos_crawler_spark.fixtures.synth import pages_table
    from wos_crawler_spark.operators.parse_plaintext import parse_pages

    cores = spark.sparkContext.defaultParallelism
    pages = pages_table(spark, n, partitions=cores * 2).persist()
    pages.count()
    t0 = time.time()
    n_docs, n_bytes = (
        parse_pages(pages)
        .agg(F.count(F.lit(1)), F.sum(F.length("extracted_text")))
        .first()
    )
    dt = time.time() - t0
    pages.unpersist()
    return {
        "workload": "parse",
        "sec": round(dt, 2),
        "items": int(n_docs),
        "throughput": round(n_docs / dt, 1),
        "unit": "docs/sec",
        "extracted_bytes": int(n_bytes),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--repeat", type=int, default=3,
                    help="runs per (level, workload); best-of wins — "
                         "this box is a shared VM with 1.5-2x "
                         "co-tenant noise between identical runs")
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    args = ap.parse_args()

    results: dict[int, dict[str, dict]] = {}
    for cores in CORE_LEVELS:
        spark = _fresh_spark(cores)
        results[cores] = {}
        for fn in (run_crawl, run_parse):
            best = None
            times = []
            for _ in range(args.repeat):
                r = fn(spark, args.n)
                r["cores"] = cores
                times.append(r["sec"])
                print(json.dumps(r), flush=True)
                if best is None or r["sec"] < best["sec"]:
                    best = r
            best["all_secs"] = times
            results[cores][best["workload"]] = best
        spark.stop()

    lo, hi = CORE_LEVELS
    ratio = hi // lo
    eff = {
        w: round(
            results[hi][w]["throughput"] / results[lo][w]["throughput"] / ratio, 3
        )
        for w in ("crawl", "parse")
    }
    summary = {
        "metric": "scaling_efficiency",
        "levels": list(CORE_LEVELS),
        "n_pages": args.n,
        "efficiency": eff,
        "throughputs": {
            w: {c: results[c][w]["throughput"] for c in CORE_LEVELS}
            for w in ("crawl", "parse")
        },
    }
    print(json.dumps(summary), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    ncpu = os.cpu_count()
    rows = []
    for w in ("crawl", "parse"):
        a, b = results[lo][w], results[hi][w]
        rows.append(
            f"| {w} | {a['sec']}s | {a['throughput']} {a['unit']} | "
            f"{b['sec']}s | {b['throughput']} {b['unit']} | **{eff[w]}** |"
        )
    out.write_text(
        f"""# BENCH/BASELINE — two-parallelism scaling protocol results

North rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox protocol (no real cluster): same job, same input
({args.n:,} synthetic Common-Crawl-style pages, seed-deterministic,
`wos_crawler_spark.fixtures.synth`), run at local[{lo}] and local[{hi}]
in one {ncpu}-core container ({platform.platform()}). Efficiency =
(throughput_{hi} / throughput_{lo}) / {ratio}.

| Workload | local[{lo}] time | local[{lo}] throughput | local[{hi}] time | local[{hi}] throughput | efficiency |
|---|---|---|---|---|---|
{chr(10).join(rows)}

- **crawl** = full frontier wave loop (3 waves: seed match, robots LPM
  broadcast join, Bloom + exact anti-join dedup, salted token-bucket
  politeness schedule, fetch join, link expansion, checkpoints) with
  parse off — the north-star "frontier-expansion + fetch-schedule
  throughput (URLs/sec)".
- **parse** = vectorized WoS field-tag `mapInPandas` parser over the
  same pages (byte-identity path), docs/sec.
- Caveats: single-JVM local mode shares one driver; per-wave driver
  costs (job launch, checkpoint commit) are parallelism-independent and
  depress measured efficiency versus a real multi-executor cluster,
  where the driver pays the same per-wave cost while executors scale.
  Numbers vary with co-tenant load on this box; the recorded run is the
  committed one.

Raw per-run JSON:

```json
{json.dumps(results, indent=2, default=str)}
```

Summary:

```json
{json.dumps(summary, indent=2)}
```
""",
        encoding="utf-8",
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
