"""Embedding similarity search over an ``array<float>`` column.

Two paths, per the training-data-pipeline brief:
- **brute-force cosine top-k** (the correctness baseline): JVM-side
  ``zip_with``/``aggregate`` dot products against a broadcast query
  set, per-query top-k via window. Linear scan — fine as the oracle
  and for small query batches at any corpus size (one pass, no state).
- **LSH-bucketed ANN** (the scale path): deterministic random-
  hyperplane signatures (hash-derived planes, no RNG state) put each
  vector in a bucket; queries only score their bucket (+ optional
  multi-probe neighbors). Recall trades against bucket fan-in; the
  bucket join replaces the full scan with a hash join on signature.

Also: embedding-cosine near-duplicate pairs (blocked all-pairs ≥
threshold) for embedding-level dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set
    against the full corpus — one scan, no shuffle of the corpus
    except the final per-query top-k (tiny)."""
    q = F.broadcast(queries.select(q_id_col, q_vec_col))
    scored = corpus.select(id_col, vec_col).crossJoin(q).select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Deterministic random-hyperplane LSH signature (int). Plane
    coefficients derive from xxhash64(plane, dim_index) — reproducible
    anywhere, no RNG state (same rule as the fixtures)."""
    bits = []
    for p in range(n_planes):
        # pseudo-random ±1 plane: sign of a hash per (plane, dim)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: v
                * F.when(F.pmod(F.xxhash64(F.lit(p), i), 2) == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ANN top-k: score only the query's LSH bucket. Approximate —
    recall measured against brute_force_topk in tests."""
    c = corpus.withColumn("_sig", hyperplane_signature(F.col(vec_col), dim, n_planes))
    q = queries.withColumn("_sig", hyperplane_signature(F.col(q_vec_col), dim, n_planes))
    scored = c.join(F.broadcast(q), "_sig").select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("cos"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: only pairs
    sharing a hyperplane bucket are scored (near-identical vectors
    collide with high probability)."""
    if dim is None:
        raise ValueError("dim required (embedding length)")
    s = df.withColumn("_sig", hyperplane_signature(F.col(vec_col), dim, n_planes))
    a = s.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "_sig")
    b = s.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "_sig")
    return (
        a.join(b, "_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .dropDuplicates(["id_a", "id_b"])
    )
