"""Hashed n-gram LM scoring — the CCNet perplexity gate (Wenzek et
al. 2020): documents ranked by language-model fit against a trusted
reference corpus and bucketed head / middle / tail on corpus
percentiles. CCNet uses a KenLM 5-gram; the engine's deterministic,
oracle-recomputable restatement is a **hashed trigram LM with
Laplace smoothing**:

    p(w3 | w1 w2) = (c3[b3(w1 w2 w3)] + 1) / (c2[b2(w1 w2)] + V)

with c3/c2 exact integer bucket counts over the reference corpus
(orders salted apart: ``lm3:`` / ``lm2:`` key prefixes before the
md5 bucket hash), V = n_buckets. A document's score is the sum of
``ln p`` over its trigrams — the float-sum trap is handled by the
engine's BM25/DSIR protocol: each per-trigram contribution is an
identical IEEE expression tree over exact integers in both engines,
floor-quantized to integer nano units, then summed as BIGINT —
order-independent, overflow-safe, byte-identical to the DuckDB
oracle. ``avg_nano`` (mean log-prob per trigram; the monotone
transform of perplexity) is the bucketing key.

Reference seam: no analog in the single-node crawler; this is the
training-data family's model-based gate between the heuristic rules
(textquality) and the trained classifier (textclassify) — the same
slot CCNet occupies between C4-style rules and fastText filters.

Scale shape (mirrors DSIR): counting is one corpus pass whose
exchanges are capped at ≤ n_buckets rows by partial aggregation;
the count tables broadcast; expr scoring pays one (id)-keyed
exchange of small partial-aggregate rows; the Arrow twin
(:func:`lm_score_arrow`) densifies both count vectors driver-side
and scores in a single mapInPandas pass — zero joins, zero
shuffles, text never leaves its partition. Percentile cutoffs are
the CALLER's choice: exact ``percentile`` at test scale,
``approx_percentile`` on a billion documents (documented knob, not
a hidden cap).

Documents with fewer than 3 tokens have no trigrams and are
UNSCORED (absent from the output) — the caller routes them through
the length rules instead, which is where CCNet sends them too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textclassify import feature_bucket
from wos_crawler_spark.operators.textdedup import words_of

NANO = 1_000_000_000.0
DEFAULT_BUCKETS = 1 << 21


def lm_tokens(c: Column) -> Column:
    """Shared tokenization, empties dropped (the DSIR drop_empty
    convention — an empty doc has no tokens, hence no trigrams)."""
    return F.filter(words_of(c), lambda w: w != "")


def lm_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """``(id, b3, b2)`` — one row per trigram OCCURRENCE; ``b2`` is
    the bucket of the trigram's two-word context. Map-side explode
    (chained projections so lambdas capture materialized arrays)."""
    w = df.select(F.col(id_col), lm_tokens(F.col(text_col)).alias("_w"))
    tri = w.select(
        F.col(id_col),
        F.explode(
            F.transform(
                # sequence(1, 0) DESCENDS in Spark — guard short docs
                # to an empty index array instead.
                F.when(
                    F.size("_w") >= 3,
                    F.sequence(F.lit(1), F.size("_w") - 2),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.struct(
                    F.concat_ws(
                        " ",
                        F.get("_w", i - 1),
                        F.get("_w", i),
                        F.get("_w", i + 1),
                    ).alias("k3"),
                    F.concat_ws(
                        " ", F.get("_w", i - 1), F.get("_w", i)
                    ).alias("k2"),
                ),
            )
        ).alias("_t"),
    )
    return tri.select(
        F.col(id_col),
        feature_bucket(
            F.concat(F.lit("lm3:"), F.col("_t.k3")), n_buckets
        ).alias("b3"),
        feature_bucket(
            F.concat(F.lit("lm2:"), F.col("_t.k2")), n_buckets
        ).alias("b2"),
    )


def lm_contexts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """``(id, b2)`` — one row per bigram OCCURRENCE (ALL bigrams,
    including the final one that is context of no trigram — standard
    corpus counting c(w1 w2))."""
    w = df.select(F.col(id_col), lm_tokens(F.col(text_col)).alias("_w"))
    bi = w.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.when(
                    F.size("_w") >= 2,
                    F.sequence(F.lit(1), F.size("_w") - 1),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(
                    " ", F.get("_w", i - 1), F.get("_w", i)
                ),
            )
        ).alias("_k2"),
    )
    return bi.select(
        F.col(id_col),
        feature_bucket(
            F.concat(F.lit("lm2:"), F.col("_k2")), n_buckets
        ).alias("b2"),
    )


def lm_train(
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Exact integer count tables from the reference corpus:
    ``(b3, c3)`` over trigrams and ``(b2, c2)`` over all bigrams.
    Each is one partial-aggregated exchange of ≤ n_buckets rows."""
    tri = lm_ngrams(ref, id_col, text_col, n_buckets)
    c3 = tri.groupBy("b3").agg(F.count(F.lit(1)).alias("c3"))
    c2 = (
        lm_contexts(ref, id_col, text_col, n_buckets)
        .groupBy("b2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return c3, c2


def _contrib_nano(c3: Column, c2: Column, n_buckets: int) -> Column:
    """floor(1e9 · (ln(c3+1) − ln(c2+V))) as BIGINT — the identical
    IEEE tree the oracle states (counts are exact integers; V as a
    python float repr round-trips to the same double)."""
    v = float(n_buckets)
    return F.floor(
        (
            F.log(c3.cast("double") + F.lit(1.0))
            - F.log(c2.cast("double") + F.lit(v))
        )
        * F.lit(NANO)
    ).cast("long")


def lm_score(
    df: DataFrame,
    c3: DataFrame,
    c2: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Expr/oracle flavor: ``(id, n_tri, lp_nano, avg_nano)``.
    Two broadcast joins on the exploded trigram rows, one (id)-keyed
    partial-aggregated exchange. ``avg_nano`` =
    floor(lp_nano / n_tri) via double division — exact cross-engine
    because lp_nano < 2^53 and both engines floor the identical
    quotient."""
    tri = lm_ngrams(df, id_col, text_col, n_buckets)
    j = (
        tri.join(F.broadcast(c3), "b3", "left")
        .join(F.broadcast(c2), "b2", "left")
        .select(
            F.col(id_col),
            _contrib_nano(
                F.coalesce("c3", F.lit(0)),
                F.coalesce("c2", F.lit(0)),
                n_buckets,
            ).alias("_w"),
        )
    )
    agg = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tri"),
        F.sum("_w").alias("lp_nano"),
    )
    return agg.withColumn(
        "avg_nano",
        F.floor(F.col("lp_nano").cast("double") / F.col("n_tri")).cast(
            "long"
        ),
    )


def lm_score_arrow(
    df: DataFrame,
    c3: DataFrame,
    c2: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Arrow scale twin (bit-equal, test-pinned): densify both count
    tables driver-side (8 B · n_buckets each — the fastText-scale
    ceiling DSIR/classifier already accept), ship once per executor,
    score each batch with hashlib-md5 bucketing + numpy gathers.
    Zero joins, zero shuffles."""
    import numpy as np

    nb = int(n_buckets)
    v3 = np.zeros(nb, dtype=np.int64)
    for b, c in c3.collect():
        if not (0 <= b < nb):
            raise ValueError(f"c3 bucket {b} out of range [0, {nb})")
        v3[b] = c
    v2 = np.zeros(nb, dtype=np.int64)
    for b, c in c2.collect():
        if not (0 <= b < nb):
            raise ValueError(f"c2 bucket {b} out of range [0, {nb})")
        v2[b] = c
    vf = float(nb)
    id_type = df.schema[id_col].dataType.simpleString()

    def _score(batches):
        import hashlib
        import math
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def bucket(s: str) -> int:
            return (
                int.from_bytes(
                    hashlib.md5(s.encode("utf-8")).digest()[:4], "big"
                )
                % nb
            )

        for pdf in batches:
            ids, ns, lps, avgs = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(t, str):
                    continue
                toks = [
                    w
                    for w in ws.sub(" ", t.lower()).strip(" ").split(" ")
                    if w
                ]
                if len(toks) < 3:
                    continue
                lp = 0
                n = len(toks) - 2
                for j in range(n):
                    b3 = bucket(
                        "lm3:" + " ".join(toks[j : j + 3])
                    )
                    b2 = bucket("lm2:" + toks[j] + " " + toks[j + 1])
                    lp += int(
                        math.floor(
                            (
                                math.log(float(v3[b3]) + 1.0)
                                - math.log(float(v2[b2]) + vf)
                            )
                            * NANO
                        )
                    )
                ids.append(i)
                ns.append(n)
                lps.append(lp)
                avgs.append(int(math.floor(float(lp) / n)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_tri": ns,
                    "lp_nano": lps,
                    "avg_nano": avgs,
                }
            )

    schema = (
        f"{id_col} {id_type}, n_tri long, lp_nano long, avg_nano long"
    )
    return df.mapInPandas(_score, schema)


def lm_bucket(
    scored: DataFrame, head_cut: int, tail_cut: int
) -> DataFrame:
    """CCNet's head/middle/tail labels from explicit ``avg_nano``
    cutoffs (head = best LM fit): ``head`` if avg_nano ≥ head_cut,
    ``tail`` if avg_nano < tail_cut, else ``middle``. Cutoffs come
    from the caller — corpus percentiles by CCNet convention."""
    if head_cut < tail_cut:
        raise ValueError("head_cut must be >= tail_cut")
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col("avg_nano") >= head_cut, F.lit("head"))
        .when(F.col("avg_nano") < tail_cut, F.lit("tail"))
        .otherwise(F.lit("middle")),
    )
