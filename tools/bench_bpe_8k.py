"""BPE trainer at production vocab scale (round-5 VERDICT item 5):
the s/merge curve to 8k merges in ONE batched training run (milestone
walltimes via bpe_train's progress hook), plus the documented
sampled-corpus fast path — train the merge table on a deterministic
hash-sample of the corpus (standard tokenizer practice: GPT-2/
SentencePiece train on corpus samples), which shrinks the
distinct-word table the per-merge pair-count aggregation is bounded
by.

Usage: python tools/bench_bpe_8k.py [--n 200000] [--merges 8000]
           [--batch 16] [--sample-mod 10]
Writes BENCH/BPE_8K.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_scaling import _cpu_probe, _fresh_spark  # noqa: E402
from tools.bench_scaling_textops import prepare_input  # noqa: E402

INPUT = "/dev/shm/wcs-scaling-textops"
MILESTONES = (1000, 2000, 4000, 8000)


def _train_with_curve(wc, merges, batch):
    from wos_crawler_spark.operators.bpe import bpe_train

    t0 = time.time()
    hit: dict[int, float] = {}
    pending = [m for m in MILESTONES if m <= merges]

    def progress(n_applied: int) -> None:
        while pending and n_applied >= pending[0]:
            hit[pending[0]] = round(time.time() - t0, 1)
            pending.pop(0)

    ms, _ = bpe_train(wc, merges, batch=batch, progress=progress)
    return ms, round(time.time() - t0, 1), hit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--merges", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sample-mod", type=int, default=10)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    prepare_input(args.n)
    spark = _fresh_spark(args.cores)
    from wos_crawler_spark.operators.bpe import corpus_word_counts

    corpus = spark.read.parquet(INPUT)
    wc = corpus_word_counts(corpus).localCheckpoint(eager=True)
    n_words = wc.count()

    probe_full = round(_cpu_probe(), 3)
    ms_full, t_full, curve_full = _train_with_curve(
        wc, args.merges, args.batch
    )

    # sampled fast path: deterministic hash-sample of DOCS (1/mod),
    # then the same trainer on the (smaller) distinct-word table
    sampled = corpus.where(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(args.sample_mod)) == 0
    )
    wcs = corpus_word_counts(sampled).localCheckpoint(eager=True)
    n_words_s = wcs.count()
    probe_s = round(_cpu_probe(), 3)
    ms_s, t_s, curve_s = _train_with_curve(wcs, args.merges, args.batch)

    shared_prefix = 0
    for a, b in zip(ms_full, ms_s):
        if a[:2] != b[:2]:
            break
        shared_prefix += 1

    out = {
        "n_docs": args.n,
        "n_distinct_words_full": n_words,
        "n_distinct_words_sampled": n_words_s,
        "cores": args.cores,
        "batch": args.batch,
        "merges": len(ms_full),
        "full_s": t_full,
        "full_curve": curve_full,
        "full_s_per_merge": round(t_full / max(len(ms_full), 1), 4),
        "sampled_mod": args.sample_mod,
        "sampled_merges": len(ms_s),
        "sampled_s": t_s,
        "sampled_curve": curve_s,
        "sampled_s_per_merge": round(t_s / max(len(ms_s), 1), 4),
        "sampled_shared_merge_prefix": shared_prefix,
        "probe_full": probe_full,
        "probe_sampled": probe_s,
    }
    print(json.dumps(out))
    md = Path(__file__).resolve().parents[1] / "BENCH" / "BPE_8K.md"
    seg = []
    prev_m, prev_t = 0, 0.0
    for m in sorted(curve_full):
        seg.append(
            f"| {prev_m}→{m} | {curve_full[m] - prev_t:.1f}s |"
            f" {(curve_full[m] - prev_t) / (m - prev_m):.3f} |"
        )
        prev_m, prev_t = m, curve_full[m]
    md.write_text(
        f"""# BPE at production vocab scale — 8k-merge curve (round 5)

Corpus: {args.n:,} docs ({n_words:,} distinct words), local[{args.cores}],
batch={args.batch}, CPU probes full={probe_full} sampled={probe_s}
(clean < 0.5).

## Full-corpus curve (one run, milestone walltimes)

| merge range | segment wall | s/merge |
|---|---|---|
{chr(10).join(seg)}

Total: **{len(ms_full)} merges in {t_full}s
({t_full / max(len(ms_full), 1):.3f} s/merge)** — extrapolated 32k
vocabulary ≈ {t_full / max(len(ms_full), 1) * 32000 / 3600:.1f}h on
this box. The per-merge cost is the vocab-bounded pair-count
aggregation (BENCH/BPE_MERGES.md decomposition), so the curve is
flat-to-mildly-rising as the symbol table grows; driver round-trips
are already amortized (~{len(ms_full) // args.batch} jobs).

## Sampled-corpus fast path (documented trade)

Deterministic doc hash-sample 1/{args.sample_mod}
({n_words_s:,} distinct words): **{len(ms_s)} merges in {t_s}s
({t_s / max(len(ms_s), 1):.3f} s/merge)**. Merge lists share a
{shared_prefix}-merge prefix with full-corpus training — sampling
changes pair statistics, so the learned vocabulary drifts after the
common head; this is the standard tokenizer-training trade
(reference trainers sample large corpora) and is why it is a
documented FAST PATH, not the default. Bit-identity tests for the
batched selection itself are unchanged (tests/test_bpe.py).

JSON: `{json.dumps(out)}`
"""
    )
    print(f"wrote {md}")
    spark.stop()


if __name__ == "__main__":
    main()
