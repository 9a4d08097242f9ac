"""Sequence packing — the training-batch construction step between a
curated corpus and a pretraining run: concatenate documents in a
deterministic order (with a separator token after each, the EOS
convention) and slice the stream into fixed ``block_size`` context
windows. This is the standard "concat and chunk" recipe (GPT-2 /
The Pile preprocessing; docs straddle block boundaries rather than
padding), emitted here as a *manifest* — (doc, block, offsets, length)
pieces — because the engine deals in token COUNTS, not token ids; any
tokenizer's ids can be gathered with the manifest afterwards
(``gather_blocks`` does it for an array column).

Semantics (pinned):

- packing order is ascending ``id_col`` (total order; ids unique);
- each doc contributes ``n_tokens + sep_tokens`` to the stream
  (separator AFTER every doc, last included — Pile-style EOS);
- docs with ``n_tokens <= 0`` (or NULL) are dropped — a phantom
  separator for an empty doc would shift every later block;
- a doc occupies the half-open global interval [end - L, end) where
  ``end`` is the running sum of L in packing order; its pieces are
  the intersections with block intervals [b·B, (b+1)·B);
- the last block is PARTIAL (fill < B) unless the stream length is a
  multiple of B — callers drop or pad it (``pack_stats`` reports it).

Scale design (10^9-doc corpus): the naive plan — one global
``Window.orderBy(id)`` cumsum — serializes the whole corpus through a
SINGLE partition (Spark demotes an unpartitioned ordered window to
one task). Instead the classic two-phase distributed prefix sum:
range-repartition on id (ordered partitions), per-partition running
sum via a window keyed on ``spark_partition_id()``, plus a
#partitions-row offsets table (broadcast) — the result is provably
independent of where the range boundaries land, so the sampled
RangePartitioner cannot perturb the output. Rows carried through the
exchanges are (id, L) manifest stubs, never text. The DuckDB oracle
states the INVARIANT directly: a plain single-node
``sum() OVER (ORDER BY id)`` cumsum must reproduce the distributed
result exactly (all-integer arithmetic — no float anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_manifest(
    docs: DataFrame,
    block_size: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    sep_tokens: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(doc_id, block_id, doc_offset, block_offset, piece_len)`` —
    one row per (doc, block) intersection, the packing manifest."""
    if block_size <= 0:
        raise ValueError(f"block_size must be positive, got {block_size}")
    bsz = F.lit(block_size).cast("long")
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("L", F.col("n_tokens") + F.lit(sep_tokens).cast("long"))
    )
    parts = num_partitions or d.sparkSession.sparkContext.defaultParallelism
    ranged = d.repartitionByRange(parts, F.col("doc_id")).withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("pid").orderBy("doc_id")
    local = ranged.withColumn("local_end", F.sum("L").over(w_local))
    # per-partition totals → exclusive prefix offsets: #partitions
    # rows, so the unpartitioned ordered window here is driver-scale
    # by construction, and the join back is a broadcast.
    totals = local.groupBy("pid").agg(F.sum("L").alias("ptot"))
    w_off = (
        Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(w_off), F.lit(0)).alias("poff")
    )
    g = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "L",
        (F.col("local_end") + F.col("poff")).alias("g_end"),
    )
    g = g.withColumn("g_start", F.col("g_end") - F.col("L"))
    # DIV: exact integral division (a `/` would detour through DOUBLE
    # and silently lose exactness past 2^53 global tokens).
    blocks = F.sequence(
        F.expr(f"g_start DIV {block_size}"),
        F.expr(f"(g_end - 1) DIV {block_size}"),
    )
    e = g.select(
        "doc_id", "g_start", "g_end", F.explode(blocks).alias("block_id")
    )
    p_start = F.greatest(F.col("g_start"), F.col("block_id") * bsz)
    p_end = F.least(F.col("g_end"), (F.col("block_id") + 1) * bsz)
    return e.select(
        "doc_id",
        "block_id",
        (p_start - F.col("g_start")).alias("doc_offset"),
        (p_start - F.col("block_id") * bsz).alias("block_offset"),
        (p_end - p_start).alias("piece_len"),
    )


def chunk_manifest(
    docs: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-document sliding-window chunking — the RAG/context-split
    complement to :func:`pack_manifest` (which concatenates ACROSS
    docs; this slices WITHIN them, docs never mix):
    ``(doc_id, chunk_id, start, piece_len)`` with chunk k starting at
    ``k·stride``. The chunk count is the standard formula — one chunk
    if the doc fits the window, else ``1 + ⌈(n − window)/stride⌉`` —
    so chunking STOPS once a chunk reaches the document end (no
    redundant fully-contained tail chunks), the final chunk may be
    shorter than ``window``, and ``stride < window`` yields overlap
    while ``stride > window`` yields gap-sampling. All-integer
    arithmetic (ceil by DIV); docs with NULL/non-positive token counts
    drop, matching :func:`pack_manifest`. Pure map-side projection +
    explode — zero shuffles, the corpus text never moves."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    k = F.when(F.col("n") <= window, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.expr(f"(n - {window} + {stride} - 1) DIV {stride}")
    )
    e = d.withColumn(
        "chunk_id",
        F.explode(F.sequence(F.lit(0).cast("long"), k - F.lit(1))),
    )
    start = F.col("chunk_id") * stride
    return e.select(
        "doc_id",
        "chunk_id",
        start.alias("start"),
        F.least(F.lit(window).cast("long"), F.col("n") - start).alias(
            "piece_len"
        ),
    )


def gather_chunks(
    manifest: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_arr_col: str = "tokens",
) -> DataFrame:
    """Demo assembly for :func:`chunk_manifest`: slice each chunk's
    token run out of an array column — one co-keyed join plus a
    map-side ``slice`` (1-based), no aggregation needed since chunks
    never span documents."""
    return manifest.join(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(tokens_arr_col).alias("_toks"),
        ),
        "doc_id",
    ).select(
        "doc_id",
        "chunk_id",
        F.slice(
            F.col("_toks"),
            (F.col("start") + 1).cast("int"),
            F.col("piece_len").cast("int"),
        ).alias("tokens"),
    )


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-balanced output sharding — the training-shard writer's
    assignment step: ``(doc_id, n_tokens, shard)`` such that per-shard
    token totals are near-equal. Greedy LPT bin-packing is inherently
    sequential (each placement depends on all previous bin loads), so
    the distributed restatement is SERPENTINE rank assignment: sort by
    (n_tokens DESC, doc_id) — a total order — take the 0-based global
    rank r, and snake through the shards: round q = r DIV S, shard =
    r mod S on even rounds, S-1-(r mod S) on odd rounds. Each down-up
    round pair hands every shard exactly one larger-half and one
    smaller-half item, so imbalance is bounded by per-round item decay
    instead of accumulating — and unlike LPT the result is a pure
    function of the sorted order, reproducible anywhere.

    The global rank reuses :func:`pack_manifest`'s two-phase prefix
    pattern (range repartition on the sort key, per-partition
    row_number, broadcast #partitions-row exclusive counts) because a
    bare ``Window.orderBy`` cumrank would serialize the corpus through
    one task. Rank arithmetic is all-integer; the sampled range
    boundaries cannot perturb the result (counts are exact and the
    composite sort key is unique). NULL token counts shard as 0-token
    docs rather than vanishing — sharding must be exhaustive."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias(
            "n_tokens"
        ),
    )
    parts = num_partitions or d.sparkSession.sparkContext.defaultParallelism
    order = [F.col("n_tokens").desc(), F.col("doc_id").asc()]
    ranged = d.repartitionByRange(parts, *order).withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("pid").orderBy(*order)
    local = ranged.withColumn("lrn", F.row_number().over(w_local))
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("pc"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("pc").over(w_off), F.lit(0)).alias("poff")
    )
    g = local.join(F.broadcast(offsets), "pid").withColumn(
        "rnk", F.col("poff") + F.col("lrn") - 1
    )
    s = F.lit(n_shards).cast("long")
    m = F.pmod(F.col("rnk"), s)
    q = F.expr(f"rnk DIV {n_shards}")
    shard = F.when(q % 2 == 0, m).otherwise(s - 1 - m)
    return g.select("doc_id", "n_tokens", shard.cast("int").alias("shard"))


def shard_stats(assignments: DataFrame) -> DataFrame:
    """Per-shard ``(shard, n_docs, tokens_total)`` — the balance
    monitor for :func:`assign_shards` (one tiny S-row aggregation)."""
    return assignments.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_total"),
    )


def pack_stats(manifest: DataFrame, block_size: int) -> DataFrame:
    """``(n_blocks, non_last_fill_defect, fill_last)`` — one row;
    every non-last block must be exactly full (defect 0 is the
    packing invariant), only the last may be partial."""
    per_block = manifest.groupBy("block_id").agg(
        F.sum("piece_len").alias("fill")
    )
    last = per_block.agg(F.max("block_id").alias("m"))
    return (
        per_block.crossJoin(F.broadcast(last))
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(
                F.when(F.col("block_id") != F.col("m"), F.col("fill") - block_size)
                .otherwise(0)
                .cast("long")
            ).alias("non_last_fill_defect"),
            F.max(
                F.when(F.col("block_id") == F.col("m"), F.col("fill"))
            ).alias("fill_last"),
        )
    )


def gather_blocks(
    manifest: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_arr_col: str = "tokens",
) -> DataFrame:
    """Demo assembly: given docs carrying an ``array`` token column,
    gather each block's token sequence per the manifest — slice each
    piece map-side, then ONE groupBy(block_id) with pieces ordered by
    block_offset. The separator position (the slot past each doc's
    last token) is emitted as NULL for the caller's EOS id."""
    pieces = manifest.join(docs.select(F.col(id_col).alias("doc_id"),
                                       F.col(tokens_arr_col).alias("_toks")),
                           "doc_id")
    # a piece may cover the separator slot, which lies one past the
    # doc's tokens: F.get returns NULL out of bounds (element_at
    # would RAISE under Spark 4's default ANSI mode).
    sl = F.transform(
        F.sequence(
            F.col("doc_offset"),
            F.col("doc_offset") + F.col("piece_len") - 1,
        ),
        lambda i: F.get(F.col("_toks"), i.cast("int")),
    )
    return (
        pieces.select("block_id", "block_offset", sl.alias("piece"))
        .groupBy("block_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("block_offset", "piece"))
                    ),
                    lambda s: s["piece"],
                )
            ).alias("tokens")
        )
    )
