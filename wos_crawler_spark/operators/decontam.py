"""Benchmark decontamination for training corpora: flag training
documents that share word n-grams with an evaluation/benchmark set.

Behavior modeled on the published decontamination procedures for
GPT-3 (Brown et al. 2020, appendix C) and Llama 2: a training document
is *contaminated* when at least ``min_overlap`` of its distinct word
``n``-grams also occur anywhere in the benchmark set. (The reference
crawler has no analog — this is part of the training-data pipeline
family the engine adds on top of SURVEY.md §2.)

Scale design (the 100 TB shape):

- The benchmark side is small relative to the corpus (eval suites are
  10^4–10^6 documents → 10^6–10^8 distinct n-grams); its digest set is
  built once, deduplicated, and **broadcast**. The corpus side then
  never shuffles its text: n-gram generation is a map-side
  explode-within-row, the semi join against the broadcast set is
  map-side, and the per-document overlap count partially aggregates to
  exactly one row per document *before* any exchange (a document's
  exploded n-grams all live in the partition of their source row).
- Only ``(id, n_overlap)`` pairs for documents with ≥1 hit ever cross
  the wire, and contamination is rare by construction, so that hit
  table is re-broadcast for the final annotate join — the full plan
  moves zero corpus bytes through a shuffle. If a caller expects
  pathological contamination rates they can disable that with
  ``broadcast_hits=False`` (falls back to a key-only shuffle join).
- Digests: ``md5`` by default (recomputable in any engine — the DuckDB
  oracle rebuilds the whole pipeline from scratch, no snapshot);
  ``xxhash64`` as the scale path (8-byte keys → ~4× smaller broadcast
  and hash tables; same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textdedup import shingles_from_words, words_of


def _digest(col, kind: str):
    if kind == "md5":
        return F.md5(col)
    if kind == "xxhash64":
        return F.xxhash64(col)
    raise ValueError(f"unknown digest {kind!r} (md5|xxhash64)")


def ngram_digest_table(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 8,
    digest: str = "md5",
) -> DataFrame:
    """``(id, ng_digest)`` — one row per DISTINCT word n-gram of each
    document (normalized lowercase/whitespace-collapsed text). A
    document shorter than ``n`` words contributes its single full-text
    "short shingle" (same convention as textdedup's MinHash shingles),
    so short eval answers still decontaminate. Map-side only: the
    explode never leaves the source row's partition."""
    w = df.select(F.col(id_col), words_of(F.col(text_col)).alias("_w"))
    return w.select(
        F.col(id_col),
        F.explode(shingles_from_words(F.col("_w"), n)).alias("_ng"),
    ).select(F.col(id_col), _digest(F.col("_ng"), digest).alias("ng_digest"))


def benchmark_ngram_set(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    digest: str = "md5",
) -> DataFrame:
    """Deduplicated 1-column digest set of every n-gram in the
    benchmark corpus — the broadcast side. Build once per benchmark
    release and persist (it is a pure function of the eval set)."""
    w = benchmark.select(words_of(F.col(text_col)).alias("_w"))
    return (
        w.select(F.explode(shingles_from_words(F.col("_w"), n)).alias("_ng"))
        .select(_digest(F.col("_ng"), digest).alias("ng_digest"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
    digest: str = "md5",
    broadcast_hits: bool = True,
) -> DataFrame:
    """Annotate ``docs`` with ``n_contaminated`` (count of distinct
    word n-grams shared with ``benchmark``) and ``contaminated``
    (``n_contaminated >= min_overlap``). Keep/drop is a trivial filter
    on the flag; returning the annotation keeps the audit trail.
    """
    bench_set = benchmark_ngram_set(
        benchmark, bench_text_col or text_col, n=n, digest=digest
    )
    doc_ngrams = ngram_digest_table(
        docs, id_col, text_col, n=n, digest=digest
    )
    # Distinct-per-doc upstream (array_distinct in the shingler) means a
    # plain count after the semi join IS the distinct-overlap count.
    hits = (
        doc_ngrams.join(F.broadcast(bench_set), "ng_digest", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    out = docs.join(hits, id_col, "left")
    n_c = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return out.withColumn("n_contaminated", n_c).withColumn(
        "contaminated", n_c >= F.lit(min_overlap)
    )


def decontaminate_keep(docs: DataFrame, benchmark: DataFrame, **kw) -> DataFrame:
    """The clean split: documents with fewer than ``min_overlap``
    benchmark n-grams, original columns only."""
    ann = decontaminate(docs, benchmark, **kw)
    return ann.filter(~F.col("contaminated")).drop(
        "n_contaminated", "contaminated"
    )
