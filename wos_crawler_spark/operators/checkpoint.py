"""Atomic per-wave checkpoints with lineage + metrics
(SURVEY.md §3.4/§4 "iterative lineage truncation"; north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Reference behavior: Scrapy persists its request queue + dupefilter
only when ``JOBDIR`` is set (``dep:scrapy.dupefilters::RFPDupeFilter``
spills ``requests.seen``; ``dep:scrapy.core.scheduler::Scheduler``
spills the pending queue) and resumes mid-crawl from that directory.
The Spark twin checkpoints (frontier, seen, bloom, metrics) per wave.

Layout (parquet stands in for Iceberg snapshots — jars absent in this
sandbox; in production each wave is one Iceberg snapshot and resume is
time-travel to the last committed one):

    ckpt_dir/
      wave=K/
        frontier/            parquet — the NEXT wave's pending frontier
        seen_delta/          parquet — url_hashes first seen this wave
        partition_metrics/   parquet — per-partition counters + lineage
                             (partition_id, scheduled, hits, misses,
                              parsed_docs, from_seed, from_link,
                              from_retry, payload_bytes)
        bloom.bin            merged Bloom bytes
        metrics.json         wave counters + next_start_ts + lineage
        _COMMITTED           empty marker, written LAST (atomicity)

Writing the marker last makes a torn checkpoint invisible to resume:
``latest_wave`` only ever returns fully-committed waves, and the wave
loop re-executes from there deterministically (all ordering is
data-derived). The parquet round-trip also truncates the logical plan
each wave — without it, wave N's plan would embed all N-1 predecessors
(SURVEY §4: never chain waves of lazy plans).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def wave_dir(ckpt_dir: str, wave: int) -> str:
    return os.path.join(ckpt_dir, f"wave={wave}")


def commit_wave(
    ckpt_dir: str,
    wave: int,
    frontier: DataFrame,
    seen_delta: DataFrame,
    bloom_bytes: bytes,
    metrics: dict | None,
    part_metrics: DataFrame | None = None,
) -> None:
    """Write the wave's data artifacts. With ``metrics`` given, also
    finalize (marker written LAST). With ``metrics=None``, the caller
    finalizes later via :func:`write_metrics` — the wave stays
    invisible to resume until then. ``part_metrics`` persists the
    per-partition counter+lineage frame (north_rule: "per-partition
    lineage + metrics") — one map-side agg job over the wave's cache."""
    d = wave_dir(ckpt_dir, wave)
    frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
    seen_delta.write.mode("overwrite").parquet(os.path.join(d, "seen_delta"))
    if part_metrics is not None:
        part_metrics.write.mode("overwrite").parquet(
            os.path.join(d, "partition_metrics")
        )
    with open(os.path.join(d, "bloom.bin"), "wb") as f:
        f.write(bloom_bytes)
    if metrics is not None:
        write_metrics(ckpt_dir, wave, metrics)


def write_metrics(ckpt_dir: str, wave: int, metrics: dict) -> None:
    """Finalize a wave: metrics.json, then the _COMMITTED marker."""
    d = wave_dir(ckpt_dir, wave)
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    with open(os.path.join(d, "_COMMITTED"), "w") as f:
        f.write("")


def latest_wave(ckpt_dir: str) -> int | None:
    """Highest wave K with a _COMMITTED marker, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    waves = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("wave=") and os.path.exists(
            os.path.join(ckpt_dir, name, "_COMMITTED")
        ):
            waves.append(int(name.split("=", 1)[1]))
    return max(waves) if waves else None


def read_frontier(spark: SparkSession, ckpt_dir: str, wave: int) -> DataFrame:
    return spark.read.parquet(os.path.join(wave_dir(ckpt_dir, wave), "frontier"))


def read_seen(spark: SparkSession, ckpt_dir: str, upto_wave: int) -> DataFrame:
    """Union of seen deltas for waves 0..upto_wave (in production: one
    Iceberg table appended per wave, partitioned by wave)."""
    paths = [
        os.path.join(wave_dir(ckpt_dir, w), "seen_delta")
        for w in range(upto_wave + 1)
    ]
    return spark.read.parquet(*paths)


def read_partition_metrics(
    spark: SparkSession, ckpt_dir: str, wave: int
) -> DataFrame:
    """Per-partition counters + lineage provenance for a committed
    wave (resume diagnostics / skew forensics)."""
    return spark.read.parquet(
        os.path.join(wave_dir(ckpt_dir, wave), "partition_metrics")
    )


def read_bloom_bytes(ckpt_dir: str, wave: int) -> bytes:
    with open(os.path.join(wave_dir(ckpt_dir, wave), "bloom.bin"), "rb") as f:
        return f.read()


def read_metrics(ckpt_dir: str, wave: int) -> dict:
    with open(os.path.join(wave_dir(ckpt_dir, wave), "metrics.json")) as f:
        return json.load(f)
