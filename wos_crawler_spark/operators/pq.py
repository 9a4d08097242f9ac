"""Product quantization (Jégou, Douze & Schmid 2011) — the
memory-bounded ANN scale path beyond IVF/LSH: a d-dim float vector
(d·4 bytes) compresses to ``m_sub`` one-byte-ish codes by splitting
it into m_sub subvectors and replacing each with the index of its
nearest per-subspace centroid; query-time scoring is ADC (asymmetric
distance computation) — one (m_sub × k) lookup table per query, then
every corpus vector scores as a sum of m_sub table entries without
ever touching its floats. At 10^9 × 384-dim this is 1.5 KB → ~48 B
per vector: the difference between an index that fits executor
memory and one that does not.

Reference seam: none in the crawler — this extends the brief's
similarity-search family (brute force → LSH → IVF → IVF-PQ is the
published escalation ladder; FAISS implements exactly this stack).

Metric: plain L2 over RAW vectors — Jégou's original setting (the
engine's cosine operators stay the semantic near-dup family; PQ is
the metric-space compressor). Rankings use squared L2, monotone in
L2.

Determinism protocol (the engine's cross-engine float discipline):
- Codebook TRAINING is free-form numpy (Lloyd on a hash-selected,
  driver-bounded sample — Jégou trains on a learning set too); the
  trained codebooks are the PINNED intermediate (snapshot), so
  training floats never race the oracle.
- Everything DOWNSTREAM of the codebooks is exactly reproducible:
  every subvector distance is a LEFT-ASSOCIATIVE float64 chain
  ``((q1-c1)²+(q2-c2)²)+…`` — the same IEEE op sequence the
  generated oracle SQL spells out term by term — floor-quantized to
  integer nanos; ADC scores are BIGINT sums of those entries
  (order-independent, overflow-safe); argmin/rank ties break on the
  lowest code / vec_id.

Scale shape: encoding is one mapInPandas pass (zero shuffles, the
codebook rides the closure); ADC scoring streams the codes table
once per query batch with per-partition top-k heaps, so the global
exchange carries ≤ queries·k·partitions candidate rows, never the
corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_TRAIN_SAMPLE = 1 << 18  # driver-collect ceiling (guardrail)
NANO = 1_000_000_000.0


def _seq_sq_dist(q: np.ndarray, c: np.ndarray) -> float:
    """Left-associative float64 squared-L2 chain — the EXACT op
    sequence the oracle SQL generates; never replace with numpy
    reductions (pairwise summation reorders the adds)."""
    acc = 0.0
    for j in range(q.shape[0]):
        d = float(q[j]) - float(c[j])
        acc += d * d
    return acc


def pq_train(
    corpus: DataFrame,
    m_sub: int = 8,
    k: int = 256,
    n_iter: int = 10,
    sample: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Codebooks ``(m_sub, k, dsub)`` from Lloyd's algorithm per
    subspace over a hash-selected sample (smallest ``xxhash64(id)`` —
    no RNG state, partitioning-invariant). Deterministic throughout:
    init = the k sample subvectors of smallest (hash, id); empty
    clusters keep their previous centroid; fixed iteration count.
    Training is honest numpy (fast path) — its floats are pinned by
    the snapshot, not re-derived by the oracle."""
    if sample > MAX_TRAIN_SAMPLE:
        raise ValueError(
            f"sample {sample} exceeds the driver-collect ceiling "
            f"{MAX_TRAIN_SAMPLE}; train on a sample — that is the "
            "published recipe, not a compromise"
        )
    rows = (
        corpus.select(id_col, vec_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h", id_col)
        .limit(sample)
        .collect()
    )
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    if n < k:
        raise ValueError(f"sample ({n}) smaller than k ({k})")
    dsub = dim // m_sub
    Xs = X.reshape(n, m_sub, dsub)
    books = np.empty((m_sub, k, dsub), dtype=np.float64)
    for m in range(m_sub):
        S = Xs[:, m, :]
        C = S[:k].copy()
        for _ in range(n_iter):
            # assign: ||s-c||² = ||s||² - 2s·c + ||c||² (argmin is
            # tie-broken to the lowest code by numpy argmin)
            d2 = (
                (S * S).sum(1, keepdims=True)
                - 2.0 * (S @ C.T)
                + (C * C).sum(1)
            )
            a = d2.argmin(1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = S[mask].mean(0)
        books[m] = C
    return books


def codebooks_df(spark, books: np.ndarray) -> DataFrame:
    """``(sub, code, vec)`` — the snapshot-able form of the trained
    codebooks (and the join side of the SQL oracle)."""
    rows = [
        (m, c, [float(v) for v in books[m, c]])
        for m in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    return spark.createDataFrame(
        rows, "sub int, code int, vec array<double>"
    )


def books_from_df(cb: DataFrame) -> np.ndarray:
    rows = cb.orderBy("sub", "code").collect()
    m_sub = 1 + max(r["sub"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    dsub = len(rows[0]["vec"])
    books = np.empty((m_sub, k, dsub), dtype=np.float64)
    for r in rows:
        books[r["sub"], r["code"]] = r["vec"]
    return books


def pq_encode(
    df: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, codes array<int>)`` — one Arrow pass, zero shuffles;
    the (m_sub·k·dsub) codebook rides the closure. Distances use the
    oracle's left-associative chain so the argmin is bit-identical
    to the SQL recomputation (ties → lowest code, matching the
    oracle's (dist, code) row_number order)."""
    m_sub, k, dsub = books.shape
    id_type = df.schema[id_col].dataType.simpleString()

    def _enc(batches):
        for pdf in batches:
            ids, codes = [], []
            for i, v in zip(pdf[id_col], pdf[vec_col]):
                if v is None or len(v) != m_sub * dsub:
                    continue
                q = np.asarray(v, dtype=np.float64)
                cs = []
                for m in range(m_sub):
                    sub = q[m * dsub : (m + 1) * dsub]
                    best, best_d = 0, None
                    for c in range(k):
                        d = _seq_sq_dist(sub, books[m, c])
                        if best_d is None or d < best_d:
                            best, best_d = c, d
                    cs.append(best)
                ids.append(i)
                codes.append(cs)
            yield pd.DataFrame({id_col: ids, "codes": codes})

    return df.mapInPandas(_enc, f"{id_col} {id_type}, codes array<int>")


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    k_top: int = 10,
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_queries: int = 100_000,
) -> DataFrame:
    """ADC top-k: ``(q_id, vec_id, adc_nano, rank)``. Per query, a
    (m_sub × k) table of floor-nano-quantized subvector distances is
    built once (the same left-assoc chain as encoding); each corpus
    row scores as the BIGINT sum of m_sub entries — its floats are
    never read. Per-partition heaps keep ≤ k_top rows per query, so
    the only exchange carries queries·k_top·partitions candidates;
    the final window ranks that small set (ties → vec_id)."""
    from pyspark.sql.window import Window

    m_sub, k, dsub = books.shape
    qrows = queries.select(q_id_col, q_vec_col).orderBy(q_id_col).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"{len(qrows)} queries exceed max_queries={max_queries}; "
            "batch the query set"
        )
    luts = {}
    for r in qrows:
        q = np.asarray(r[q_vec_col], dtype=np.float64)
        t = np.empty((m_sub, k), dtype=np.int64)
        for m in range(m_sub):
            sub = q[m * dsub : (m + 1) * dsub]
            for c in range(k):
                t[m, c] = int(
                    np.floor(_seq_sq_dist(sub, books[m, c]) * NANO)
                )
        luts[r[q_id_col]] = t
    q_id_type = queries.schema[q_id_col].dataType.simpleString()
    id_type = codes.schema[id_col].dataType.simpleString()

    def _score(batches):
        import heapq

        heaps = {qid: [] for qid in luts}
        for pdf in batches:
            for i, cs in zip(pdf[id_col], pdf["codes"]):
                for qid, t in luts.items():
                    s = 0
                    for m in range(m_sub):
                        s += int(t[m, cs[m]])
                    # max-heap by (-score, -id): keep k_top smallest
                    # (score, id) pairs per partition
                    item = (-s, -int(i))
                    if len(heaps[qid]) < k_top:
                        heapq.heappush(heaps[qid], item)
                    elif item > heaps[qid][0]:
                        heapq.heapreplace(heaps[qid], item)
        out_q, out_i, out_s = [], [], []
        for qid, h in heaps.items():
            for negs, negi in h:
                out_q.append(qid)
                out_i.append(-negi)
                out_s.append(-negs)
        yield pd.DataFrame(
            {"q_id": out_q, id_col: out_i, "adc_nano": out_s}
        )

    cand = codes.mapInPandas(
        _score,
        f"q_id {q_id_type}, {id_col} {id_type}, adc_nano long",
    )
    w = Window.partitionBy("q_id").orderBy("adc_nano", id_col)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("q_id", id_col, "adc_nano", F.col("rank").cast("int"))
    )


def pq_score_candidates(
    cand: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    queries: DataFrame,
    k_top: int = 10,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    id_col: str = "vec_id",
    max_queries: int = 100_000,
) -> DataFrame:
    """ADC over a CANDIDATE set — the IVF-PQ composition (FAISS's
    IVFADC minus residual encoding, which trades exactness of the
    oracle for a modest recall gain and is documented out): a coarse
    quantizer proposes ``(q_id, vec_id)`` pairs (ivf_candidates),
    and only those rows are ADC-scored, so query cost is
    O(candidates · m_sub) integer adds instead of a corpus scan.
    Same nano-LUT / BIGINT-sum / tie-on-vec_id protocol as
    :func:`pq_topk`; one candidate-keyed join against the codes
    table is the only exchange."""
    from pyspark.sql.window import Window

    m_sub, k, dsub = books.shape
    qrows = queries.select(q_id_col, q_vec_col).orderBy(q_id_col).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"{len(qrows)} queries exceed max_queries={max_queries}"
        )
    luts = {}
    for r in qrows:
        q = np.asarray(r[q_vec_col], dtype=np.float64)
        t = np.empty((m_sub, k), dtype=np.int64)
        for m in range(m_sub):
            sub = q[m * dsub : (m + 1) * dsub]
            for c in range(k):
                t[m, c] = int(
                    np.floor(_seq_sq_dist(sub, books[m, c]) * NANO)
                )
        luts[r[q_id_col]] = t
    q_id_type = cand.schema[q_id_col].dataType.simpleString()
    id_type = codes.schema[id_col].dataType.simpleString()

    j = cand.join(codes, id_col)

    def _score(batches):
        for pdf in batches:
            out_q, out_i, out_s = [], [], []
            for qid, i, cs in zip(
                pdf[q_id_col], pdf[id_col], pdf["codes"]
            ):
                t = luts.get(qid)
                if t is None:
                    continue
                s = 0
                for m in range(m_sub):
                    s += int(t[m, cs[m]])
                out_q.append(qid)
                out_i.append(i)
                out_s.append(s)
            yield pd.DataFrame(
                {q_id_col: out_q, id_col: out_i, "adc_nano": out_s}
            )

    scored = j.mapInPandas(
        _score,
        f"{q_id_col} {q_id_type}, {id_col} {id_type}, adc_nano long",
    )
    w = Window.partitionBy(q_id_col).orderBy("adc_nano", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select(q_id_col, id_col, "adc_nano", F.col("rank").cast("int"))
    )
