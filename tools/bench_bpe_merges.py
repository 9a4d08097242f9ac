"""BPE trainer driver-round-trip scaling: batched vs sequential merge
selection at production-ish merge counts (VERDICT r3 item 3's
evidence line).

The sequential trainer pays 1 driver round-trip (pair-count job +
argmax collect) PER MERGE — ~10^5 sequential Spark jobs for a 32k
vocabulary, an Amdahl wall no core count fixes. Batched selection
(operators/bpe.select_merge_batch) applies the longest
provably-sequential-equal prefix of the top-4B pairs per round-trip,
cutting jobs to ~n_merges/B with a BIT-IDENTICAL merge list (pinned
by tests/test_bpe.py::test_batched_equals_sequential and the
unchanged from-scratch SQL oracle).

This tool measures walltime at --merges (default 1000) for batch=1 vs
batch=--batch (default 16) on the textops corpus, plus the implied
per-merge driver latency. Equality of the two merge lists is asserted.
Sequential at 1000 merges is slow by construction — pass
--seq-merges to cap the sequential leg and extrapolate per-merge cost.

Usage: python tools/bench_bpe_merges.py [--n 200000] [--merges 1000]
           [--batch 16] [--seq-merges 200]
Writes BENCH/BPE_MERGES.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.bench_scaling import _cpu_probe, _fresh_spark  # noqa: E402
from tools.bench_scaling_textops import prepare_input  # noqa: E402

INPUT = "/dev/shm/wcs-scaling-textops"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq-merges", type=int, default=200)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    prepare_input(args.n)
    spark = _fresh_spark(args.cores)
    from wos_crawler_spark.operators.bpe import bpe_train, corpus_word_counts

    wc = corpus_word_counts(spark.read.parquet(INPUT)).localCheckpoint(
        eager=True
    )
    n_words = wc.count()

    probe_b = round(_cpu_probe(), 3)
    t0 = time.time()
    m_batched, _ = bpe_train(wc, args.merges, batch=args.batch)
    t_batched = time.time() - t0

    probe_s = round(_cpu_probe(), 3)
    t0 = time.time()
    m_seq, _ = bpe_train(wc, args.seq_merges, batch=1)
    t_seq = time.time() - t0

    assert m_seq == m_batched[: len(m_seq)], (
        "batched merge list diverged from sequential prefix"
    )

    seq_per_merge = t_seq / max(len(m_seq), 1)
    batched_per_merge = t_batched / max(len(m_batched), 1)
    out = {
        "n_docs": args.n,
        "n_distinct_words": n_words,
        "cores": args.cores,
        "batch": args.batch,
        "batched_merges": len(m_batched),
        "batched_sec": round(t_batched, 1),
        "batched_sec_per_merge": round(batched_per_merge, 4),
        "seq_merges": len(m_seq),
        "seq_sec": round(t_seq, 1),
        "seq_sec_per_merge": round(seq_per_merge, 4),
        "speedup_per_merge_x": round(seq_per_merge / batched_per_merge, 2),
        "seq_extrapolated_sec_at_batched_count": round(
            seq_per_merge * len(m_batched), 1
        ),
        "probes_s": [probe_b, probe_s],
    }
    print(json.dumps(out))
    md = Path(__file__).resolve().parents[1] / "BENCH" / "BPE_MERGES.md"
    md.write_text(
        "# BPE batched merge selection — walltime at "
        f"{args.merges} merges\n\n"
        f"Corpus: {args.n} docs ({n_words} distinct words), local["
        f"{args.cores}]. Merge lists verified identical (sequential "
        "prefix == batched prefix).\n\n"
        f"- batched (B={args.batch}): **{out['batched_merges']} merges "
        f"in {out['batched_sec']}s** "
        f"({out['batched_sec_per_merge']}s/merge)\n"
        f"- sequential (B=1): {out['seq_merges']} merges in "
        f"{out['seq_sec']}s ({out['seq_sec_per_merge']}s/merge) → "
        f"extrapolates to {out['seq_extrapolated_sec_at_batched_count']}s "
        f"at {out['batched_merges']} merges\n"
        f"- per-merge speedup: **{out['speedup_per_merge_x']}×**\n"
        f"- CPU probes: {out['probes_s']}\n\n"
        "At a production 32k-merge vocabulary the same ratio separates "
        "~10^5 sequential driver jobs from ~10^3 round-trips; the "
        "batched list stays bit-identical to sequential BPE "
        "(select_merge_batch's disjoint-prefix + strict-descent rule).\n"
    )
    print(f"# wrote {md}")
    spark.stop()


if __name__ == "__main__":
    main()
