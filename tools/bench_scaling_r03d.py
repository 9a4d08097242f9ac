"""Two-parallelism scaling protocol for the final round-3 operator
batch — the same N vs 4N evidence the north rule demands
(tools/bench_scaling.py), applied to the three new corpus-pass
shapes:

  * textnorm       — pure map: one Arrow NFC hop + codegen strips,
                     zero shuffles (the embarrassingly-parallel
                     baseline any scan-shaped op should match);
  * bpe            — mixed: corpus-scale word count (one partial-agg
                     exchange) + 16 vocab-bounded merge iterations
                     (sequential driver-latency jobs — the Amdahl
                     term) + the zero-shuffle Arrow encode pass over
                     the full corpus;
  * heavy_hitters  — sketch: per-partition MG summaries (Arrow map)
                     + bounded candidate merge + broadcast-semi-join
                     exact recount (every exchange capped at m).

Protocol identical to the main tool: input generated ONCE to tmpfs
parquet; levels run in interleaved pairs sharing ambient co-tenant
conditions; efficiency = median over pairs of
(throughput_4N / throughput_N) / 4; a fixed-work CPU probe taken
before every measured run flags co-tenant storms.

Corpus: the textops generator's deterministic ~52-token docs from a
50k-token vocabulary (real BPE merge mass: repeated words across
docs), plus a zipf-ish derived key for the heavy-hitter stream.

Usage: python tools/bench_scaling_r03d.py [--n 1000000] [--pairs 2]
Writes BENCH/SCALING_R03D.md.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.bench_scaling import (  # noqa: E402
    CORE_LEVELS,
    _cpu_probe,
    _fresh_spark,
    _warm_python_workers,
)
from tools.bench_scaling_textops import prepare_input  # noqa: E402

INPUT = "/dev/shm/wcs-scaling-textops"
N_MERGES = 16


def run_textnorm(spark) -> dict:
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.textnorm import normalize_documents

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    t0 = time.time()
    out = normalize_documents(docs, out_col="clean")
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("norm_changed").cast("long")).alias("changed"),
        F.sum(F.octet_length("clean")).alias("bytes"),
    ).first()
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "changed": int(row["changed"]),
        "bytes": int(row["bytes"]),
        "n_docs": n_docs,
    }


def run_bpe(spark) -> dict:
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.bpe import (
        bpe_encode_documents,
        bpe_train,
        corpus_word_counts,
    )

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    t0 = time.time()
    merges, _ = bpe_train(corpus_word_counts(docs), N_MERGES)
    enc = bpe_encode_documents(docs, merges)
    row = enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("tokens")).alias("tokens"),
    ).first()
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "n_merges": len(merges),
        "tokens": int(row["tokens"]),
        "n_docs": n_docs,
    }


def run_heavy_hitters(spark) -> dict:
    """Frequent WORDS over the exploded corpus (~52M keys at n=1M):
    a genuinely corpus-scale stream — a per-doc scalar key finishes
    in under a second and measures job-launch overhead, not the
    operator."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.heavyhitters import heavy_hitters

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    t0 = time.time()
    keyed = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("key")
    )
    top = heavy_hitters(keyed, "key", k=10, m=1024).collect()
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "top1_n": int(top[0].n),
        "n_docs": n_docs,
    }


def run_boilerplate(spark) -> dict:
    """Host-boilerplate detection+strip over a synthetic host axis:
    host = doc_id % 4096 (so per-host page counts are real), with an
    injected per-host chrome line so detection genuinely bites."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.boilerplate import (
        boilerplate_lines,
        strip_boilerplate,
    )

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    t0 = time.time()
    d = F.col("doc_id")
    pages = docs.select(
        F.concat(F.lit("https://h"), (d % 4096).cast("string"),
                 F.lit("/p"), d.cast("string")).alias("url"),
        F.concat(F.lit("h"), (d % 4096).cast("string")).alias("host"),
        F.concat(
            F.lit("NAV h"), (d % 4096).cast("string"), F.lit("\n"),
            F.col("text"),
        ).alias("text"),
    )
    chrome = boilerplate_lines(pages, min_pages=2, min_frac_pct=50)
    out = strip_boilerplate(pages, chrome)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_lines_in").alias("li"),
        F.sum("n_lines_kept").alias("lk"),
    ).first()
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "lines_stripped": int(row["li"] - row["lk"]),
        "n_docs": n_docs,
    }


def run_delta(spark) -> dict:
    """Snapshot diff: old vs a deterministic mutation (1/11 removed,
    1/7 changed, 1/13 added) — one digest-only full-outer join."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.deltas import corpus_delta

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    t0 = time.time()
    d = F.col("doc_id")
    url = F.concat(F.lit("u"), d.cast("string"))
    old = docs.select(url.alias("url"), "text")
    new = docs.filter(d % 11 != 0).select(
        url.alias("url"),
        F.when(d % 7 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"),
    ).unionByName(
        docs.filter(d % 13 == 0).select(
            F.concat(F.lit("new"), d.cast("string")).alias("url"),
            F.lit("fresh").alias("text"),
        )
    )
    counts = (
        corpus_delta(old, new)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "delta_rows": int(sum(r.n for r in counts)),
        "n_docs": n_docs,
    }


def run_delta_bucketed(spark) -> dict:
    """The steady-state production shape: both snapshots PRE-bucketed
    by url (the Iceberg ``bucket(url)`` layout the raw-delta docstring
    assumes — layout cost excluded, as for the crawl's
    prepare_fetch_side contract). The join then runs exchange-free
    over co-partitioned cached sides; this measures the diff itself,
    not the one-off re-layout the raw variant pays."""
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.deltas import corpus_delta

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    d = F.col("doc_id")
    url = F.concat(F.lit("u"), d.cast("string"))
    old = (
        docs.select(url.alias("url"), F.md5("text").alias("text"))
        .repartition(64, "url")
        .cache()
    )
    new = (
        docs.filter(d % 11 != 0)
        .select(
            url.alias("url"),
            F.md5(
                F.when(
                    d % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
                ).otherwise(F.col("text"))
            ).alias("text"),
        )
        .unionByName(
            docs.filter(d % 13 == 0).select(
                F.concat(F.lit("new"), d.cast("string")).alias("url"),
                F.md5(F.lit("fresh")).alias("text"),
            )
        )
        .repartition(64, "url")
        .cache()
    )
    old.count(), new.count()  # materialize layout outside the clock
    t0 = time.time()
    counts = (
        corpus_delta(old, new)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dt = time.time() - t0
    old.unpersist(), new.unpersist()
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "delta_rows": int(sum(r.n for r in counts)),
        "n_docs": n_docs,
    }


WORKLOADS = {
    "textnorm": run_textnorm,
    "bpe": run_bpe,
    "heavy_hitters": run_heavy_hitters,
    "boilerplate": run_boilerplate,
    "delta": run_delta,
    "delta_bucketed": run_delta_bucketed,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs=2, default=list(CORE_LEVELS))
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated workload subset")
    args = ap.parse_args()
    lo, hi = args.levels
    factor = hi / lo
    if args.only:
        keep = set(args.only.split(","))
        for k in list(WORKLOADS):
            if k not in keep:
                del WORKLOADS[k]

    print(f"generating {args.n} docs → {INPUT}", flush=True)
    prepare_input(args.n)

    runs: dict[str, dict[int, list[dict]]] = {
        w: {lo: [], hi: []} for w in WORKLOADS
    }
    best_probe = float("inf")
    for pair in range(args.pairs):
        for cores in (lo, hi):
            spark = _fresh_spark(cores)
            _warm_python_workers(spark, cores)
            for w, fn in WORKLOADS.items():
                probe = _cpu_probe()
                best_probe = min(best_probe, probe)
                r = fn(spark)
                r["probe"] = round(probe, 3)
                r["pair"] = pair
                runs[w][cores].append(r)
                print(json.dumps({"workload": w, "cores": cores, **r}), flush=True)
            spark.stop()

    lines = [
        "# Scaling — final round-3 batch (textnorm, BPE, heavy hitters)",
        "",
        f"Protocol: tools/bench_scaling_r03d.py — {args.n} docs "
        f"(~52 tokens, 50k-token vocabulary), generated once to tmpfs "
        f"parquet; interleaved pairs at local[{lo}] vs local[{hi}]; "
        f"efficiency = median over pairs of (thr_{hi} / thr_{lo}) / "
        f"{factor:.0f}. CPU probe best {best_probe:.3f}s (probe > "
        "1.5x best = co-tenant storm; flagged).",
        "",
        "| workload | cores | run | sec | docs/s | probe |",
        "|---|---|---|---|---|---|",
    ]
    summary = {}
    for w in WORKLOADS:
        effs = []
        for pair in range(args.pairs):
            a = runs[w][lo][pair]
            b = runs[w][hi][pair]
            effs.append((b["docs_per_sec"] / a["docs_per_sec"]) / factor)
        for cores in (lo, hi):
            for r in runs[w][cores]:
                storm = " ⚠" if r["probe"] > 1.5 * best_probe else ""
                lines.append(
                    f"| {w} | {cores} | {r['pair']} | {r['sec']} "
                    f"| {r['docs_per_sec']} | {r['probe']}{storm} |"
                )
        med = statistics.median(effs)
        summary[w] = {
            "median_efficiency": round(med, 3),
            "per_pair": [round(e, 3) for e in effs],
        }
        lines.append(
            f"| {w} | — | **median efficiency** | **{med:.3f}** | | |"
        )
    lines += [
        "",
        "```json",
        json.dumps(summary, indent=1),
        "```",
        "",
        "BPE's efficiency carries a fixed Amdahl term: 2·N_merges "
        "sequential driver-latency jobs (argmax collect + merge-apply "
        "dispatch per iteration) that do not shrink with cores — the "
        "corpus-scale stages (word count, encode) are what scale. On "
        "a real cluster the same term is per-CRAWL constant while the "
        "corpus term grows with data, so efficiency approaches the "
        "map-stage bound as N grows.",
    ]
    name = (
        "SCALING_R03D.md"
        if not args.only
        else f"SCALING_R03D_{args.only.replace(',', '_')}.md"
    )
    out = Path(__file__).resolve().parents[1] / "BENCH" / name
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
