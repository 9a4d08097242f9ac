"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public recipe): pick raw-corpus documents whose hashed-ngram
distribution looks like a TARGET corpus (a quality reference set, a
domain sample) by importance weights under two bag-of-hashed-ngrams
unigram models, then Gumbel-top-k resample. The published web-scale
data-selection method that sits between the heuristic gates (Gopher,
C4) and a trained classifier — and it reuses this engine's existing
pieces: ``textclassify.classifier_features`` for the hashed unigram+
bigram features (md5 buckets, DuckDB-recomputable) and the
``sampling.sample_hash`` uniform for the Gumbel draw.

Math (all from exact integer counts, Laplace-smoothed):

    log w(doc) = Σ_f  tf_f · [ ln(c_t[f]+1) − ln(N_t+m)
                              − ln(c_r[f]+1) + ln(N_r+m) ]

with c_t/c_r the target/raw bucket counts, N their totals, m the
bucket count. Resampling: key = log w + Gumbel(doc), Gumbel(doc) =
−ln(−ln(u)) with u = (md5_32(doc_id)+0.5)/2^32 (the +0.5 keeps u off
0 and 1 so the double never hits ±inf) — deterministic, so the
selected set is reproducible on any cluster and recomputable by the
SQL oracle.

Determinism protocol (same as BM25): every per-bucket log weight and
every per-doc Gumbel is computed once by an identical IEEE expression
tree in both engines and floor-quantized to integer NANO-units; doc
scores are BIGINT sums of those integers — order-independent and
engine-exact up to the documented sub-ULP libm caveat (a 1-ulp ln
difference crossing a 1e-9 floor boundary; same accepted caveat as
the SemDeDup threshold).

Scale design (10^9-doc raw corpus): bucket-count aggregates are the
only corpus-wide exchanges and they carry (bucket, count) pairs
capped at ``n_buckets`` rows after partial aggregation; the weight
table (≤ n_buckets rows) broadcasts; scoring is explode → broadcast
join → one groupBy(doc) sum. Top-k selection is ``orderBy().limit(k)``
— Spark's TakeOrderedAndProject (per-partition heaps merged on the
driver), NOT a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wos_crawler_spark.operators.sampling import sample_hash
from wos_crawler_spark.operators.textclassify import classifier_features

_QUANTUM = 1_000_000_000.0
_DENOM = float(1 << 32)


def bucket_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    digest: str = "md5",
) -> DataFrame:
    """``(bucket, c)`` — corpus-wide hashed-ngram occurrence counts;
    the exchange is capped at n_buckets rows by partial aggregation."""
    return (
        classifier_features(
            df, id_col, text_col, n_buckets, digest, drop_empty=True
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_counts_arrow(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Arrow twin of ``bucket_counts`` (md5 flavor): one mapInPandas
    pass emits per-batch ``np.bincount`` partials — ≤ n_buckets rows
    per batch — and a tiny groupBy folds them. The interpreted bigram
    HOF never runs; counts are pinned bit-equal to the expr flavor
    (tests). Same Java-\\s / strip(" ") / first-4-md5-bytes traps as
    ``classifier_score``; empty docs contribute nothing (the DSIR
    drop_empty convention)."""
    nb = int(n_buckets)

    def _count(batches):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        acc = np.zeros(nb, dtype=np.int64)
        for pdf in batches:
            for t in pdf[text_col]:
                if not isinstance(t, str):
                    continue
                toks = [
                    w
                    for w in ws.sub(" ", t.lower()).strip(" ").split(" ")
                    if w
                ]
                for f in toks + [
                    toks[j] + " " + toks[j + 1]
                    for j in range(len(toks) - 1)
                ]:
                    acc[
                        int.from_bytes(
                            hashlib.md5(f.encode("utf-8")).digest()[:4],
                            "big",
                        )
                        % nb
                    ] += 1
        nz = np.nonzero(acc)[0]
        yield pd.DataFrame({"bucket": nz.astype("int64"), "c": acc[nz]})

    partials = df.mapInPandas(_count, "bucket long, c long")
    return partials.groupBy("bucket").agg(F.sum("c").alias("c"))


def dsir_log_weights(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    digest: str = "md5",
    use_arrow: bool = False,
) -> DataFrame:
    """``(bucket, w_nano)`` — floor-quantized per-bucket log-ratio
    weights for every bucket OBSERVED IN RAW (only those can score a
    raw doc; target-only buckets contribute nothing to any raw doc).
    ``use_arrow`` swaps the counting passes for the vectorized
    mapInPandas twin (md5 only; counts pinned bit-equal)."""
    if use_arrow:
        if digest != "md5":
            raise ValueError("use_arrow supports the md5 digest only")
        ct = bucket_counts_arrow(target, text_col, n_buckets)
        cr = bucket_counts_arrow(raw, text_col, n_buckets)
    else:
        ct = bucket_counts(target, id_col, text_col, n_buckets, digest)
        cr = bucket_counts(raw, id_col, text_col, n_buckets, digest)
    tot_t = ct.agg(F.sum("c").alias("n_t"))
    tot_r = cr.agg(F.sum("c").alias("n_r"))
    j = (
        cr.withColumnRenamed("c", "c_r")
        .join(ct.withColumnRenamed("c", "c_t"), "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .withColumn("c_t", F.coalesce(F.col("c_t"), F.lit(0)))
    )
    m = F.lit(float(n_buckets))
    w = (
        F.ln((F.col("c_t") + F.lit(1)).cast("double"))
        - F.ln(F.col("n_t").cast("double") + m)
        - F.ln((F.col("c_r") + F.lit(1)).cast("double"))
        + F.ln(F.col("n_r").cast("double") + m)
    )
    return j.select(
        "bucket", F.floor(w * F.lit(_QUANTUM)).cast("long").alias("w_nano")
    )


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    digest: str = "md5",
) -> DataFrame:
    """``(doc_id, n_feat, logw_nano)`` — BIGINT importance log-weight
    per raw doc (feature occurrences × bucket weights). Docs with no
    features (empty text) emit nothing — they can never be selected."""
    feats = classifier_features(
        raw, id_col, text_col, n_buckets, digest, drop_empty=True
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.sum("w_nano").alias("logw_nano"),
        )
    )


def dsir_scores_arrow(
    raw: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Arrow twin of ``dsir_scores``: densify the ≤ n_buckets weight
    table (``weights_from_table`` — driver-scale model loading with
    the out-of-range guard) and score in ONE ``classifier_score``
    pass — zero shuffles, zero joins, the corpus text never leaves
    its partition. Bit-equal to the expr flavor: every raw-observed
    bucket is in the weight table by construction, and the unmapped
    zeros are never consulted."""
    from wos_crawler_spark.operators.textclassify import (
        classifier_score,
        weights_from_table,
    )

    wvec = weights_from_table(
        weights.withColumnRenamed("w_nano", "weight"), n_buckets
    )
    scored = classifier_score(
        raw, wvec, id_col, text_col, n_buckets, drop_empty=True
    )
    return scored.select(
        F.col(id_col).alias("doc_id"),
        F.col("n_feat"),
        F.col("w_sum").alias("logw_nano"),
    )


def gumbel_nano(key: Column, salt: str = "dsir") -> Column:
    """Floor-quantized Gumbel draw from the deterministic md5 uniform:
    u = (md5_32(key||salt) + 0.5) / 2^32, g = −ln(−ln(u))."""
    h = sample_hash(key, salt) * F.lit(_DENOM)  # back to the integer
    u = (h + F.lit(0.5)) / F.lit(_DENOM)
    g = -F.ln(-F.ln(u))
    return F.floor(g * F.lit(_QUANTUM)).cast("long")


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    digest: str = "md5",
    salt: str = "dsir",
    use_arrow: bool = False,
) -> DataFrame:
    """``(doc_id, n_feat, logw_nano, key_nano, rank)`` — the k
    selected docs, Gumbel-top-k on the quantized importance weight
    (ties on doc_id). orderBy+limit → TakeOrderedAndProject, never a
    one-partition window. ``use_arrow`` (md5 only) swaps both the
    counting and the scoring corpus passes for the vectorized
    mapInPandas twins — the scale choice, since the expr flavor pays
    the interpreted bigram HOF three times over the corpus; expr
    stays the default because the oracle pins it (outputs are
    bit-equal, test-pinned)."""
    w = dsir_log_weights(
        target, raw, id_col, text_col, n_buckets, digest, use_arrow
    )
    if use_arrow:
        scored = dsir_scores_arrow(raw, w, id_col, text_col, n_buckets)
    else:
        scored = dsir_scores(raw, w, id_col, text_col, n_buckets, digest)
    keyed = scored.withColumn(
        "key_nano", F.col("logw_nano") + gumbel_nano(F.col("doc_id"), salt)
    )
    top = keyed.orderBy(F.desc("key_nano"), F.asc("doc_id")).limit(k)
    rw = Window.orderBy(F.desc("key_nano"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(rw)).select(
        "doc_id", "n_feat", "logw_nano", "key_nano", "rank"
    )
