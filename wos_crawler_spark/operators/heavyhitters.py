"""Approximate top-k frequent keys (heavy hitters) via per-partition
Misra-Gries summaries (Misra & Gries 1982) merged under the mergeable-
summaries discipline (Agarwal, Cormode, Huang, Phillips, Wei & Yi
2012), with an exact bounded recount of the surviving candidates.

The crawl-analytics question this answers at 10^10 rows: "which hosts
/ users / mime types dominate the stream?" — without the full
key-space shuffle an exact ``groupBy(key).count()`` pays. The exact
count is only ever computed for the <= m candidate keys, so every
exchange in the plan is bounded by m, not by key cardinality:

1. **Per-partition MG summary** (``mg_partition_summaries``): one
   Arrow ``mapInPandas`` pass. Each Arrow batch is pre-aggregated
   with vectorized ``value_counts`` (exact, per-batch), then folded
   into the partition's m-counter summary by the MG merge step: add
   counts, and while more than m counters remain, subtract the
   (m+1)-th largest value from all and drop the non-positive. Total
   undercount folded into a summary of total weight N is < N/(m+1)
   — the classic MG bound, preserved under this batched merge.
2. **Distributed merge** (``mg_reduce``): union of partition
   summaries (<= partitions·m rows), one bounded groupBy-sum, then
   the top-m keys by summed lower-bound count. Summed MG counts are
   LOWER bounds on true counts (each partition's counter never
   overcounts), and every key whose true global count exceeds
   N/(m+1) is guaranteed to survive into the merged candidates.
3. **Exact recount** (``heavy_hitters``): broadcast-semi-join the
   stream against the candidate set and count exactly — partial
   aggregation caps this exchange at m rows — then take the global
   top-k by (count DESC, key).

Completeness contract: the returned top-k is provably the EXACT
top-k whenever the true k-th frequency exceeds N/(m+1) (then all
true top-k keys are candidates and their recounts are exact).
``with_guarantee=True`` evaluates exactly that certificate in-band
(one extra count job) as a ``provably_complete`` column. With m at
its default 8k·candidate headroom, a stream has to be pathologically
flat — no key above N/(m+1) — before the certificate fails, and such
a stream has no meaningful heavy hitters to miss.

Determinism: the candidate SET depends on partitioning (MG decrements
are order-sensitive), but the returned top-k does not, whenever the
completeness condition holds — pinned by the partitioning-invariance
test. Weighted streams: use :func:`sketches.cms_table` (weight_col)
— MG here is unit-weight by design to keep the bound exact.

No reference-crawler analog (SURVEY.md has no frequent-items row) —
crawl-monitoring family, next to HLL (distincts) and CMS (per-key
frequency estimates): MG answers "which keys", CMS answers "how
often is THIS key", HLL answers "how many keys".
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fold_counts(summary: dict, batch_counts: dict, m: int) -> None:
    """MG merge of exact batch counts into the running summary,
    in place: add, then reduce to <= m counters by subtracting the
    (m+1)-th largest and dropping non-positives."""
    for k, c in batch_counts.items():
        summary[k] = summary.get(k, 0) + int(c)
    if len(summary) > m:
        vals = sorted(summary.values(), reverse=True)
        sub = vals[m]  # (m+1)-th largest
        for k in list(summary):
            s = summary[k] - sub
            if s > 0:
                summary[k] = s
            else:
                del summary[k]


def mg_partition_summaries(
    df: DataFrame, key_col: str, m: int
) -> DataFrame:
    """``(key, mg)`` per partition — at most m rows each; ``mg`` is a
    lower bound on the key's in-partition count with total
    undercount < N_partition/(m+1). NULL keys are excluded (they are
    not a frequency question)."""
    if m < 1:
        raise ValueError("m must be >= 1")
    schema_src = df.select(F.col(key_col).alias("key")).schema
    schema = f"key {schema_src[0].dataType.simpleString()}, mg long"

    def _summarize(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            vc = pdf["key"].dropna().value_counts()
            _fold_counts(summary, vc.to_dict(), m)
        if summary:
            yield pd.DataFrame(
                {"key": list(summary), "mg": list(summary.values())}
            )

    return df.select(F.col(key_col).alias("key")).mapInPandas(
        _summarize, schema
    )


def mg_reduce(summaries: DataFrame, m: int) -> DataFrame:
    """Merged candidates: bounded groupBy-sum over the unioned
    partition summaries, top-m by (summed lower bound DESC, key).
    The exchange carries <= partitions·m rows; the top-m is a
    single-partition sort of that bounded set."""
    merged = summaries.groupBy("key").agg(F.sum("mg").alias("mg"))
    return merged.orderBy(F.desc("mg"), F.asc("key")).limit(m)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    m: int | None = None,
    with_guarantee: bool = False,
) -> DataFrame:
    """Exact-recounted top-k frequent keys: ``(key, n)`` ordered by
    (n DESC, key), plus ``provably_complete`` when asked.

    ``m`` (candidate budget) defaults to ``max(64, 8·k)``; raise it
    to strengthen the N/(m+1) completeness threshold."""
    if k < 1:
        raise ValueError("k must be >= 1")
    m = max(64, 8 * k) if m is None else m
    if m < k:
        raise ValueError("m must be >= k")
    cands = mg_reduce(
        mg_partition_summaries(df, key_col, m), m
    ).select("key")
    exact = (
        df.select(F.col(key_col).alias("key"))
        .where(F.col("key").isNotNull())
        .join(F.broadcast(cands), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("n"))
    )
    top = exact.orderBy(F.desc("n"), F.asc("key")).limit(k)
    if not with_guarantee:
        return top
    n_total = (
        df.where(F.col(key_col).isNotNull()).count()
    )
    # certificate: k-th recount strictly above the MG loss bound.
    # A global window over the k-row limit output (already a single
    # partition) — NOT a second sort+crossJoin, which would duplicate
    # the whole summarize→merge→recount subtree in the plan.
    from pyspark.sql import Window

    w = Window.partitionBy()
    return top.withColumn(
        "provably_complete",
        F.min("n").over(w) * (m + 1) > F.lit(n_total),
    )
