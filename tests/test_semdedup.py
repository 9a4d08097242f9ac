"""SemDeDup (operators/semdedup.py): keep-rule + grouping vs a
python union-find twin over brute-force within-cell pairs, explicit
stored-quantizer path, cluster_cap guardrail."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.semdedup import (
    assign_with_sim,
    semdedup,
    semdedup_pairs,
)

DIM = 4
#: two axis-aligned cells — assignment is trivially predictable
CENTS = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [1.0, 0.01, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0, 0.0]),
    (3, [0.0, 1.0, 0.0, 0.0]),
    (4, [0.0, 1.0, 0.3, 0.0]),
    (5, [0.1, 0.9, 0.5, 0.0]),
    (6, [0.0, 0.0, 0.0, 1.0]),  # isolated singleton
]
THR = 0.95


def _python_twin():
    """Brute-force within-cell pairs + union-find + keep rule."""
    ids = [i for i, _ in VECS]
    M = np.array([v for _, v in VECS], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    cell = np.argmax(Mn @ CENTS.T, axis=1)
    cent_sim = (Mn @ CENTS.T)[np.arange(len(ids)), cell]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in ids:
        for b in ids:
            if a < b and cell[a] == cell[b] and Mn[a] @ Mn[b] >= THR:
                parent[find(b)] = min(find(a), find(b))
                parent[find(a)] = min(find(a), find(b))
    groups = {i: find(i) for i in ids}
    # min-label convention: group id = min member id
    gmin = {}
    for i, g in groups.items():
        gmin.setdefault(g, set()).add(i)
    label = {i: min(gmin[g]) for i, g in groups.items()}
    keep = {}
    for g, members in gmin.items():
        keeper = min(members, key=lambda i: (cent_sim[i], i))
        for i in members:
            keep[i] = i == keeper
    return cell, label, keep


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>"
    )


def test_matches_python_twin(spark, emb):
    cell, label, keep = _python_twin()
    rows = semdedup(emb, threshold=THR, centroids=CENTS).collect()
    assert len(rows) == len(VECS)
    for r in rows:
        i = r["vec_id"]
        assert r["cluster"] == cell[i]
        assert r["group_id"] == label[i]
        assert r["semdedup_keep"] == keep[i], f"keep mismatch vec {i}"


def test_keeper_is_least_central(spark, emb):
    """The survivor of every multi-member group has the group's
    minimal cent_sim (the paper's keep-least-typical rule)."""
    out = semdedup(emb, threshold=THR, centroids=CENTS)
    g = out.groupBy("group_id").agg(
        F.min("cent_sim").alias("mn"), F.count(F.lit(1)).alias("n")
    )
    kept = out.filter("semdedup_keep").join(g, "group_id")
    for r in kept.collect():
        assert abs(r["cent_sim"] - r["mn"]) < 1e-15
    # exactly one keeper per group
    per = out.groupBy("group_id").agg(
        F.sum(F.col("semdedup_keep").cast("int")).alias("k")
    )
    assert all(r["k"] == 1 for r in per.collect())


def test_cluster_cap_drops_oversized_cells_from_pairing(spark, emb):
    asn = assign_with_sim(emb, CENTS)
    # cell 0 has 3 members, cell 1 has 3, singleton in cell... cap=2
    pairs = semdedup_pairs(asn, THR, cluster_cap=2)
    assert pairs.count() == 0  # both populated cells exceed the cap
    uncapped = semdedup_pairs(asn, THR)
    assert uncapped.count() > 0


def test_arrow_scorer_same_pairs(spark, emb):
    """Arrow pair scorer yields the identical pair SET on the fixture
    (no value sits within a ULP of the threshold here)."""
    asn = assign_with_sim(emb, CENTS)
    expr = {(r["id_a"], r["id_b"]) for r in semdedup_pairs(asn, THR).collect()}
    arrow = {
        (r["id_a"], r["id_b"])
        for r in semdedup_pairs(asn, THR, use_arrow_scorer=True).collect()
    }
    assert arrow == expr and len(expr) > 0


def test_trained_quantizer_path_runs(spark, emb):
    """End-to-end with self-trained k-means (no stored centroids):
    semantics (one keeper per group, all rows present) hold for
    whatever cells training picks."""
    out = semdedup(emb, threshold=THR, n_centroids=2, n_iter=2)
    rows = out.collect()
    assert len(rows) == len(VECS)
    per = {}
    for r in rows:
        per.setdefault(r["group_id"], []).append(r["semdedup_keep"])
    assert all(sum(v) == 1 for v in per.values())
