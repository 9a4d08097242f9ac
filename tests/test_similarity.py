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
    """Multi-probe ANN: recall of the true top-10 ≥ 0.9 at fixture
    scale, and n_candidates exposes bucket fan-in to the caller."""
    exact = sim.brute_force_topk(emb, queries, k=10).collect()
    approx = sim.lsh_topk(
        emb, queries, dim=dim, k=10, n_planes=6, n_tables=4, probe_hamming=2
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    got_sets = {}
    for r in approx:
        got_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
        assert r["n_candidates"] >= 1
    recall = sum(
        len(exact_sets[q] & got_sets.get(q, set())) for q in exact_sets
    ) / sum(len(s) for s in exact_sets.values())
    assert recall >= 0.9, f"multi-probe recall {recall:.2f} < 0.9"
    # self-NN must always survive (identical vector → same bucket)
    self_hits = {r["q_id"] for r in approx if r["vec_id"] == r["q_id"]}
    assert self_hits == set(range(5))


def test_lsh_starvation_is_visible(emb, queries, dim):
    """With zero extra probes and many planes, sparse buckets starve —
    n_candidates must report it rather than silently under-fill."""
    out = sim.lsh_topk(
        emb, queries, dim=dim, k=10, n_planes=12, n_probes=0
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rows in per_q.items():
        n_cand = rows[0]["n_candidates"]
        if len(rows) < 10:  # under-filled list...
            assert n_cand < 10  # ...is exactly what n_candidates says


def test_ivf_recall(emb, queries, dim):
    """IVF with 8/16 cells probed recovers ≥0.8 of the true top-10
    (random 64-d embeddings are ANN-hostile; recall scales with
    n_probe — the knob a real deployment turns)."""
    exact = sim.brute_force_topk(emb, queries, k=10).collect()
    es = {}
    for r in exact:
        es.setdefault(r["q_id"], set()).add(r["vec_id"])
    ap = sim.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=8).collect()
    gs = {}
    for r in ap:
        gs.setdefault(r["q_id"], set()).add(r["vec_id"])
        assert r["n_candidates"] >= 1
    recall = sum(len(es[q] & gs.get(q, set())) for q in es) / sum(
        len(s) for s in es.values()
    )
    assert recall >= 0.8, f"IVF recall {recall:.2f} < 0.8"


def test_ivf_cells_partition_corpus(emb):
    """Every vector lands in exactly one cell; assignment is
    deterministic across runs (hash init, no RNG)."""
    C = sim.ivf_train_centroids(emb, n_centroids=8, n_iter=2)
    a1 = sim.ivf_assign(emb, C).select("vec_id", "_cluster").collect()
    a2 = sim.ivf_assign(emb, C).select("vec_id", "_cluster").collect()
    m1 = {r["vec_id"]: r["_cluster"] for r in a1}
    m2 = {r["vec_id"]: r["_cluster"] for r in a2}
    assert m1 == m2
    assert len(m1) == emb.count()
    assert all(0 <= c < 8 for c in m1.values())


def test_batch_matmul_topk_matches_numpy(spark, emb, queries, dim):
    import numpy as np

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    got = sim.brute_force_topk_batch(emb, queries, k=5).collect()
    for q in range(5):
        qv = Mn[ids == q][0]
        cos = Mn @ qv
        order = np.lexsort((ids, -np.round(cos, 10)))
        expect = list(ids[order][:5])
        mine = [
            r["vec_id"]
            for r in sorted(
                (g for g in got if g["q_id"] == q), key=lambda r: r["rank"]
            )
        ]
        assert mine == expect


def test_cosine_near_dup_pairs(spark, emb, dim):
    # plant an exact duplicate of vec 0 with id 9999
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    dup = spark.createDataFrame([(9999, v0, 0)], emb.schema)
    pairs = sim.cosine_near_dup_pairs(
        emb.unionByName(dup), threshold=0.999, dim=dim, n_planes=8
    ).collect()
    assert any((r["id_a"], r["id_b"]) == (0, 9999) for r in pairs)


def test_cosine_near_dup_clusters_match_union_find(spark, emb, dim):
    """Clusters ≡ connected components of the pair graph: recompute
    components with a plain python union-find over the collected pair
    edges and compare label sets exactly."""
    pairs = sim.cosine_near_dup_pairs(
        emb, threshold=0.3, dim=dim, n_planes=3
    ).collect()
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in sim.cosine_near_dup_clusters(
            emb, threshold=0.3, dim=dim, n_planes=3
        ).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["id_a"]), find(r["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    roots: dict[int, list[int]] = {}
    for i in ids:
        roots.setdefault(find(i), []).append(i)
    want = {i: min(members) for members in roots.values() for i in members}
    assert got == want
    assert any(v != k for k, v in got.items())  # non-vacuous: >=1 merge


def test_cosine_arrow_equals_expr(emb, queries, dim):
    """The Arrow re-rank scorer ≡ the interpreted expr twin: same
    float32-product/float64-accumulate arithmetic, so values agree to
    summation-order noise (≤1e-12) and ranking is IDENTICAL."""
    cand = (
        emb.select("vec_id")
        .crossJoin(queries.select("q_id"))
        .filter((F.col("vec_id") % 3 == 0) | (F.col("vec_id") < 50))
    )
    a = sim.score_candidates(cand, emb, queries, k=10, use_arrow=True)
    b = sim.score_candidates(cand, emb, queries, k=10, use_arrow=False)
    ra = {(r["q_id"], r["rank"]): (r["vec_id"], r["cos"])
          for r in a.collect() if r["rank"] is not None}
    rb = {(r["q_id"], r["rank"]): (r["vec_id"], r["cos"])
          for r in b.collect() if r["rank"] is not None}
    assert set(ra) == set(rb) and len(ra) > 0
    for key, (vid, cos_a) in ra.items():
        vid_b, cos_b = rb[key]
        assert vid == vid_b  # identical ranking
        assert abs(cos_a - cos_b) < 1e-12


def test_xxh64_int_matches_spark(spark):
    """The numpy XXH64 twin is bit-equal to Spark's xxhash64 over
    chained IntegerType columns — the rule the plane matrix derives
    from."""
    import numpy as np

    pairs = [
        (s, i)
        for s in [0, 1, 7, 123, 2**20, 2**30]
        for i in [0, 1, 2, 63, 999, 2**31 - 1]
    ]
    row = spark.range(1).select(
        *[
            F.xxhash64(F.lit(s), F.lit(i)).alias(f"h{k}")
            for k, (s, i) in enumerate(pairs)
        ]
    ).first()
    with np.errstate(over="ignore"):
        for k, (s, i) in enumerate(pairs):
            h = sim._xxh64_int(
                np.uint64(i), sim._xxh64_int(np.uint64(s), np.uint64(42))
            )
            assert np.int64(h) == row[f"h{k}"], (s, i)


def test_matmul_signatures_bit_equal_expr(emb, dim):
    """Arrow-matmul signatures ≡ interpreted Catalyst-expr signatures,
    per row, per table — so snapshot pins and oracle entries hold
    regardless of which path computed them."""
    n_planes, n_tables = 6, 3
    expr_cols = [
        sim.hyperplane_signature(F.col("embedding"), dim, n_planes, table=t)
        .alias(f"e{t}")
        for t in range(n_tables)
    ]
    both = sim.attach_hyperplane_signatures(
        emb.select("vec_id", "embedding", *expr_cols),
        dim, n_planes, n_tables,
    ).collect()
    assert len(both) > 0
    for r in both:
        for t in range(n_tables):
            assert r["_sigs"][t] == r[f"e{t}"], (r["vec_id"], t)


def test_lsh_candidates_matmul_equals_expr(emb, queries, dim):
    m = sim.lsh_candidates(
        emb, queries, dim=dim, n_planes=6, n_tables=2, probe_hamming=1,
        use_matmul=True,
    )
    e = sim.lsh_candidates(
        emb, queries, dim=dim, n_planes=6, n_tables=2, probe_hamming=1,
        use_matmul=False,
    )
    ms = {(r["q_id"], r["vec_id"]) for r in m.collect()}
    es = {(r["q_id"], r["vec_id"]) for r in e.collect()}
    assert ms == es and len(ms) > 0
