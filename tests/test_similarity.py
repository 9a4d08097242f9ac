"""Similarity search over the driver's embeddings table: brute-force
cosine top-k (exact baseline), LSH ANN recall, cosine near-dup pairs."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def dim(emb):
    return len(emb.first()["embedding"])


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_brute_force_topk_self_is_top1(emb, queries):
    top = sim.brute_force_topk(emb, queries, k=3)
    top1 = {r["q_id"]: r["vec_id"] for r in top.filter(F.col("rank") == 1).collect()}
    assert top1 == {i: i for i in range(5)}  # each vector's NN is itself


def test_brute_force_matches_numpy(emb, queries, dim):
    import numpy as np

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    got = sim.brute_force_topk(emb, queries, k=5).collect()
    for q in range(5):
        qv = Mn[ids == q][0]
        cos = Mn @ qv
        order = np.lexsort((ids, -np.round(cos, 10)))
        expect = list(ids[order][:5])
        mine = [r["vec_id"] for r in sorted((g for g in got if g["q_id"] == q), key=lambda r: r["rank"])]
        assert mine == expect


def test_lsh_recall(emb, queries, dim):
    exact = sim.brute_force_topk(emb, queries, k=10).collect()
    approx = sim.lsh_topk(emb, queries, dim=dim, k=10, n_planes=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    hit = total = 0
    for r in approx:
        total += 1
        hit += r["vec_id"] in exact_sets[r["q_id"]]
    assert total > 0
    # self-NN must always survive (identical vector → same bucket)
    self_hits = {r["q_id"] for r in approx if r["vec_id"] == r["q_id"]}
    assert self_hits == set(range(5))


def test_cosine_near_dup_pairs(spark, emb, dim):
    # plant an exact duplicate of vec 0 with id 9999
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    dup = spark.createDataFrame([(9999, v0, 0)], emb.schema)
    pairs = sim.cosine_near_dup_pairs(
        emb.unionByName(dup), threshold=0.999, dim=dim, n_planes=8
    ).collect()
    assert any((r["id_a"], r["id_b"]) == (0, 9999) for r in pairs)
