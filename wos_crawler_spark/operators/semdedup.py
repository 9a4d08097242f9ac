"""SemDeDup — semantic deduplication of an embedding corpus via
k-means blocking (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"). The third
member of the embedding near-dup family: exact pairs are the oracle
baseline, LSH blocking (similarity.cosine_near_dup_*) trades recall
for collision probability, and SemDeDup blocks by a learned coarse
quantizer — pairs are scored only INSIDE a k-means cell, which is the
published web-scale recipe (LAION: k≈10^5 cells over 10^9 vectors).

Pipeline (all reused machinery):

1. cluster: the deterministic spherical k-means of the IVF index
   (similarity.ivf_train_centroids) — or pass ``centroids`` from a
   stored index; assignment is one Arrow matmul per batch against the
   broadcast k×dim matrix, emitting the cell AND the vector's cosine
   to its centroid (``cent_sim``, needed by the keep rule).
2. pair: self-join on the cell id, ``id_a < id_b``, exact cosine ≥
   ``threshold``. The ONLY exchange that carries vectors — one
   cluster-keyed shuffle; pair enumeration is quadratic within a cell
   by construction, so ``n_centroids`` must scale with the corpus
   (cells of 10^3–10^5) and ``cluster_cap`` drops oversized cells
   from PAIRING (their members stay, un-deduped — the same
   recall-losing-but-never-wrong guardrail as SimHash's bucket_cap).
3. group: connected components of the pair graph
   (textdedup.min_label_components — min-label propagation with
   pointer jumping; shuffles (id, label) pairs only).
4. keep: one survivor per group — the member with the LOWEST cosine
   to its cluster centroid (the paper's best-performing rule: the
   least-typical example carries the most information), ties broken
   on id. Singletons keep themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wos_crawler_spark.operators.similarity import (
    cosine,
    cosine_arrow,
    ivf_assign,
    ivf_train_centroids,
)
from wos_crawler_spark.operators.textdedup import min_label_components


def assign_with_sim(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``similarity.ivf_assign(with_sim=True)`` — one shared matmul
    implementation, so SemDeDup and the IVF index can never diverge
    on assignment arithmetic."""
    return ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col, with_sim=True
    )


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_cap: int | None = None,
    use_arrow_scorer: bool = False,
) -> DataFrame:
    """``(id_a, id_b, cos)`` — semantic-dup pairs within k-means
    cells. ``assigned`` must carry ``_cluster`` (assign_with_sim).
    Default expr-scored cosine (the threshold makes membership
    last-ULP sensitive; the expr flavor is what the oracle pins, same
    convention as cosine_near_dup_pairs); ``use_arrow_scorer=True``
    swaps in the vectorized Arrow scorer — the scale choice at
    production dims (384–1536) where an interpreted per-pair
    aggregate dominates the within-cell scoring, with the same
    sub-ULP membership caveat as score_candidates."""
    s = assigned.select("_cluster", id_col, vec_col)
    if cluster_cap is not None:
        ok = (
            s.groupBy("_cluster")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= cluster_cap)
            .select("_cluster")
        )
        s = s.join(F.broadcast(ok), "_cluster")
    a = s.select(
        "_cluster", F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    b = s.select(
        "_cluster", F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    scorer = cosine_arrow if use_arrow_scorer else cosine
    return (
        a.join(b, "_cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", scorer(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_iter: int = 3,
    centroids=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_cap: int | None = None,
    max_iter: int = 50,
    use_arrow_scorer: bool = False,
) -> DataFrame:
    """``(id, cluster, cent_sim, group_id, semdedup_keep)`` — one row
    per input vector. ``semdedup_keep`` marks the group survivor
    (lowest cent_sim, then lowest id); filtering on it IS the paper's
    dedup. Pass ``centroids`` (k×dim array) to reuse a stored
    quantizer — otherwise k-means trains here (n_iter corpus scans)."""
    if centroids is None:
        centroids = ivf_train_centroids(
            df, n_centroids=n_centroids, n_iter=n_iter,
            id_col=id_col, vec_col=vec_col,
        )
    # localCheckpoint (the min_label_components idiom): `assigned`
    # feeds FIVE scans below (both pair-join sides, the cap count,
    # vertices, the final projection) — without materialization each
    # re-runs the full-corpus assignment matmul through the python
    # workers, ~5x the operator's dominant cost.
    assigned = assign_with_sim(df, centroids, id_col, vec_col).localCheckpoint()
    pairs = semdedup_pairs(
        assigned, threshold, id_col, vec_col, cluster_cap,
        use_arrow_scorer=use_arrow_scorer,
    )
    vertices = assigned.select(F.col(id_col).alias("_id")).distinct()
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = min_label_components(vertices, edges, max_iter=max_iter)
    out = assigned.select(
        F.col(id_col),
        F.col("_cluster").alias("cluster"),
        F.col("_cent_sim").alias("cent_sim"),
    ).join(
        labels.select(F.col("_id").alias(id_col), F.col("label").alias("group_id")),
        id_col,
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("cent_sim").asc(), F.col(id_col).asc()
    )
    return out.withColumn(
        "semdedup_keep", F.row_number().over(w) == 1
    )
