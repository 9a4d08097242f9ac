"""Product quantization: deterministic training, encode/ADC parity
with a pure-python twin over the same codebooks, the self-vector
minimality invariant, partitioning invariance, and guardrails."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.pq import (
    MAX_TRAIN_SAMPLE,
    NANO,
    _seq_sq_dist,
    books_from_df,
    codebooks_df,
    pq_encode,
    pq_topk,
    pq_train,
)

M, K, DSUB, DIM = 4, 8, 4, 16


def _vec(i):
    # deterministic pseudo-random floats, clustered by i % 5
    base = [(((i % 5) * 1315423911 + j * 2654435761 + i * 97) % 1000) / 250.0 - 2.0
            for j in range(DIM)]
    return [round(v + 0.01 * ((i * 31 + j) % 7), 6) for j, v in enumerate(base)]


@pytest.fixture(scope="module")
def world(spark):
    rows = [(i, _vec(i)) for i in range(120)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(5).cache()
    books = pq_train(df, m_sub=M, k=K, n_iter=5, sample=120)
    return rows, df, books


def _py_codes(v, books):
    q = np.asarray(v, dtype=np.float64)
    out = []
    for m in range(M):
        sub = q[m * DSUB : (m + 1) * DSUB]
        dists = [_seq_sq_dist(sub, books[m, c]) for c in range(K)]
        out.append(min(range(K), key=lambda c: (dists[c], c)))
    return out


def test_train_deterministic_and_shapes(spark, world):
    _, df, books = world
    assert books.shape == (M, K, DSUB)
    again = pq_train(df.repartition(11), m_sub=M, k=K, n_iter=5, sample=120)
    assert np.array_equal(books, again)
    # codebooks round-trip through the DataFrame form bit-exactly
    rt = books_from_df(codebooks_df(spark, books))
    assert np.array_equal(books, rt)


def test_encode_matches_python_twin(spark, world):
    rows, df, books = world
    # the raw float32 parquet values are what both sides must read:
    # pull them back from Spark so the twin sees float32-rounded input
    stored = {r["vec_id"]: r["embedding"] for r in df.collect()}
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df, books).collect()
    }
    assert set(got) == set(stored)
    for i, v in stored.items():
        assert got[i] == _py_codes(v, books), i


def test_topk_matches_python_twin_and_self_minimality(spark, world):
    rows, df, books = world
    stored = {r["vec_id"]: r["embedding"] for r in df.collect()}
    codes = pq_encode(df, books).cache()
    queries = df.filter(F.col("vec_id") < 4)
    got = pq_topk(queries, codes, books, k_top=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_nano"])
        )
    # python twin: full ADC ranking
    pcodes = {i: _py_codes(v, books) for i, v in stored.items()}
    for qid in range(4):
        q = np.asarray(stored[qid], dtype=np.float64)
        lut = [
            [
                int(np.floor(_seq_sq_dist(
                    q[m * DSUB : (m + 1) * DSUB], books[m, c]) * NANO))
                for c in range(K)
            ]
            for m in range(M)
        ]
        scored = sorted(
            (sum(lut[m][pcodes[i][m]] for m in range(M)), i)
            for i in stored
        )[:10]
        expect = [
            (rk + 1, i, s) for rk, (s, i) in enumerate(scored)
        ]
        assert sorted(by_q[qid]) == expect, qid
        # self-minimality: the query's own row attains the minimum
        # possible ADC (its codes are the per-subspace argmins)
        self_score = sum(lut[m][pcodes[qid][m]] for m in range(M))
        assert self_score == min(s for s, _ in scored)


def test_partitioning_invariance(spark, world):
    _, df, books = world
    q = df.filter(F.col("vec_id") < 2)
    a = sorted(map(tuple, pq_topk(
        q, pq_encode(df.repartition(1), books), books, k_top=5
    ).collect()))
    b = sorted(map(tuple, pq_topk(
        q, pq_encode(df.repartition(13), books), books, k_top=5
    ).collect()))
    assert a == b


def test_guardrails(spark, world):
    _, df, _ = world
    with pytest.raises(ValueError, match="ceiling"):
        pq_train(df, sample=MAX_TRAIN_SAMPLE + 1)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, m_sub=5, k=8, sample=120)
    with pytest.raises(ValueError, match="smaller than k"):
        pq_train(df, m_sub=4, k=121, sample=120)


def test_score_candidates_matches_restricted_twin(spark, world):
    from wos_crawler_spark.operators.pq import pq_score_candidates

    rows, df, books = world
    stored = {r["vec_id"]: r["embedding"] for r in df.collect()}
    codes = pq_encode(df, books)
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    # candidate set: q 0 sees ids 0..29, q 1 sees odd ids, q 2 NONE
    cand_rows = [(0, i) for i in range(30)] + [
        (1, i) for i in range(120) if i % 2
    ]
    cand = spark.createDataFrame(cand_rows, "q_id long, vec_id long")
    got = pq_score_candidates(
        cand, codes, books, queries, k_top=5
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_nano"])
        )
    assert 2 not in by_q  # starved query: no candidates, no rows
    pcodes = {i: _py_codes(v, books) for i, v in stored.items()}
    allowed = {0: set(range(30)), 1: {i for i in range(120) if i % 2}}
    for qid in (0, 1):
        q = np.asarray(stored[qid], dtype=np.float64)
        lut = [
            [
                int(np.floor(_seq_sq_dist(
                    q[m * DSUB : (m + 1) * DSUB], books[m, c]) * NANO))
                for c in range(K)
            ]
            for m in range(M)
        ]
        scored = sorted(
            (sum(lut[m][pcodes[i][m]] for m in range(M)), i)
            for i in allowed[qid]
        )[:5]
        expect = [(rk + 1, i, s) for rk, (s, i) in enumerate(scored)]
        assert sorted(by_q[qid]) == expect, qid
