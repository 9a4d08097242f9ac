"""Two-parallelism scaling protocol for the round-3 text operators
(span dedup + LM perplexity gate) — the same N vs 4N evidence the
north rule demands for crawl/parse (tools/bench_scaling.py), applied
to the two newest corpus-pass shapes:

  * span_dedup — shuffle-heavy: one corpus-tokens-sized exchange
    keyed by span hash + a per-doc interval merge (the ExactSubstr
    manifest, Arrow window-hash flavor);
  * lm_gate    — scan-heavy: hashed trigram LM train (two capped
    count exchanges) + the zero-shuffle Arrow scoring pass.

Protocol identical to the main tool: input generated ONCE to tmpfs
parquet; levels run in interleaved pairs sharing ambient co-tenant
conditions; efficiency = median over pairs of
(throughput_4N / throughput_N) / 4; a fixed-work CPU probe taken
before every measured run flags co-tenant storms.

Corpus: deterministic synthetic docs of ~52 tokens from a 50k-token
vocabulary; every 5th doc replays its predecessor's token block, so
span dedup always has real duplicated spans to rank and merge (about
a fifth of all windows are duplicates — work, not a no-op).

Usage: python tools/bench_scaling_textops.py [--n 1000000] [--pairs 2]
Writes BENCH/SCALING_TEXTOPS_r03.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
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

INPUT = "/dev/shm/wcs-scaling-textops"
SPAN_LEN = 20
LM_BUCKETS = 1 << 18


def prepare_input(n: int) -> None:
    shutil.rmtree(INPUT, ignore_errors=True)
    spark = _fresh_spark(32)

    def _gen(batches):
        import pandas as pd

        def toks(i: int) -> list[str]:
            base = (i * 2654435761) & 0x7FFFFFFF
            return [f"w{(base + j * 97) % 50000}" for j in range(52)]

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                t = toks(int(i))
                if i % 5 == 0 and i > 0:
                    # replay the predecessor's block → planted dup spans
                    t = toks(int(i) - 1) + t[:10]
                texts.append(" ".join(t))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    spark.range(n, numPartitions=64).mapInPandas(
        _gen, "doc_id long, text string"
    ).write.parquet(INPUT)
    spark.stop()


def run_span_dedup(spark) -> dict:
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.textdedup import span_dedup_manifest

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    t0 = time.time()
    m = span_dedup_manifest(docs, span_len=SPAN_LEN, use_arrow=True)
    row = m.agg(
        F.count(F.lit(1)).alias("intervals"),
        F.sum("n_tokens").alias("tokens_removed"),
    ).first()
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "intervals": int(row["intervals"]),
        "tokens_removed": int(row["tokens_removed"]),
        "n_docs": n_docs,
    }


def run_lm_gate(spark) -> dict:
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.lmscore import lm_score_arrow, lm_train

    docs = spark.read.parquet(INPUT)
    n_docs = docs.count()
    t0 = time.time()
    ref = docs.filter(F.col("doc_id") % 20 == 7)
    c3, c2 = lm_train(ref, n_buckets=LM_BUCKETS)
    scored = lm_score_arrow(docs, c3, c2, n_buckets=LM_BUCKETS)
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lp_nano").alias("lp"),
    ).first()
    dt = time.time() - t0
    return {
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
        "scored": int(row["n"]),
        "lp_sum": int(row["lp"]),
        "n_docs": n_docs,
    }


WORKLOADS = {"span_dedup": run_span_dedup, "lm_gate": run_lm_gate}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument(
        "--levels", type=int, nargs=2, default=list(CORE_LEVELS)
    )
    args = ap.parse_args()
    lo, hi = args.levels
    factor = hi / lo

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
                print(
                    json.dumps(
                        {"workload": w, "cores": cores, **r}
                    ),
                    flush=True,
                )
            spark.stop()

    lines = [
        "# Scaling — round-3 text operators (span dedup, LM gate)",
        "",
        f"Protocol: tools/bench_scaling_textops.py — {args.n} docs "
        f"(~52 tokens each, every 5th doc replays its predecessor), "
        f"generated once to tmpfs parquet; interleaved pairs at "
        f"local[{lo}] vs local[{hi}]; efficiency = median over pairs "
        f"of (thr_{hi} / thr_{lo}) / {factor:.0f}. CPU probe best "
        f"{best_probe:.3f}s (runs with probe > 1.5x best ran during "
        "a co-tenant storm; flagged below).",
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
            effs.append(
                (b["docs_per_sec"] / a["docs_per_sec"]) / factor
            )
        for cores in (lo, hi):
            for r in runs[w][cores]:
                storm = (
                    " ⚠" if r["probe"] > 1.5 * best_probe else ""
                )
                lines.append(
                    f"| {w} | {cores} | {r['pair']} | {r['sec']} "
                    f"| {r['docs_per_sec']} | {r['probe']}{storm} |"
                )
        med = statistics.median(effs)
        summary[w] = {
            "median_efficiency": round(med, 3),
            "per_pair": [round(e, 3) for e in effs],
            "best_thr_lo": max(
                r["docs_per_sec"] for r in runs[w][lo]
            ),
            "best_thr_hi": max(
                r["docs_per_sec"] for r in runs[w][hi]
            ),
        }
        lines.append(
            f"| {w} | — | — | — | **efficiency "
            f"{med:.3f}** (pairs: "
            + ", ".join(f"{e:.3f}" for e in effs)
            + ") | |"
        )
    lines += [
        "",
        "Criterion: ≥ 0.8 (BASELINE.json north_rule). "
        "Invariant check: interval/score sums are identical at "
        "every level (same input, deterministic operators).",
        "",
        "```json",
        json.dumps(summary, indent=2),
        "```",
        "",
    ]
    out = Path(__file__).resolve().parents[1] / "BENCH"
    out.mkdir(exist_ok=True)
    (out / "SCALING_TEXTOPS_r03.md").write_text("\n".join(lines))
    print(json.dumps(summary))
    # invariant: results identical across levels
    for w in WORKLOADS:
        keys = [
            tuple(
                sorted(
                    (k, v)
                    for k, v in r.items()
                    if k
                    in ("intervals", "tokens_removed", "scored", "lp_sum")
                )
            )
            for lvl in (lo, hi)
            for r in runs[w][lvl]
        ]
        assert len(set(keys)) == 1, f"{w}: results differ across levels!"
    shutil.rmtree(INPUT, ignore_errors=True)


if __name__ == "__main__":
    main()
