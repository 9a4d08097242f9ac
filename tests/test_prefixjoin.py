"""Exact prefix-filtered set-similarity join (Vernica/Carey/Li
2010): completeness vs brute force (the whole point — no LSH-style
recall loss), integer-threshold exactness at the boundary, length
pruning soundness, partitioning invariance, threshold guard."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textdedup import (
    norm_text,
    prefix_jaccard_pairs,
    shingles_from_words,
    words_of,
)


def _brute(spark, df, n, t_num, t_den):
    s = df.select(
        F.col("doc_id").alias("_id"), words_of(F.col("text")).alias("_w")
    ).select("_id", shingles_from_words(F.col("_w"), n).alias("_s"))
    a = s.select(F.col("_id").alias("id_a"), F.col("_s").alias("sa"))
    b = s.select(F.col("_id").alias("id_b"), F.col("_s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return sorted(
        map(
            tuple,
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("n_inter", inter.cast("long"))
            .withColumn("n_union", union.cast("long"))
            .filter(F.col("n_inter") * t_den >= F.col("n_union") * t_num)
            .select("id_a", "id_b", "n_inter", "n_union")
            .collect(),
        )
    )


@pytest.fixture(scope="module")
def corpus(spark):
    base = [" ".join(f"w{i * 40 + j}" for j in range(40)) for i in range(15)]
    rows = [(i, t) for i, t in enumerate(base)]
    # near-dups at various distances
    for i in range(5):
        words = base[i].split()
        words[-1 - i] = f"zz{i}"  # i+1 word edits... one edit each
        rows.append((100 + i, " ".join(words)))
    rows.append((200, base[3]))  # exact dup
    rows.append((201, " ".join(base[4].split()[:20])))  # half of doc 4
    rows.append((202, "only two"))  # < shingle_n words
    rows.append((203, ""))  # empty
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(5).cache()


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (7, 10), (1, 4)])
def test_complete_vs_brute_force(spark, corpus, t_num, t_den):
    got = sorted(
        map(
            tuple,
            prefix_jaccard_pairs(
                corpus, shingle_n=3, t_num=t_num, t_den=t_den
            ).collect(),
        )
    )
    assert got == _brute(spark, corpus, 3, t_num, t_den)
    assert len(got) > 0  # the planted dups actually surface


def test_boundary_pairs_exact(spark):
    """A pair sitting EXACTLY at the threshold is kept (integer
    cross-multiplication, no float boundary): two 4-shingle sets
    sharing exactly 2 shingles → J = 2/6 = 1/3."""
    a = "a b c d e f"  # shingles: abc bcd cde def
    b = "c d e f g h"  # shingles: cde def efg fgh  → share {cde, def}
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    at = prefix_jaccard_pairs(df, shingle_n=3, t_num=1, t_den=3).collect()
    assert [(r["id_a"], r["id_b"], r["n_inter"], r["n_union"])
            for r in at] == [(0, 1, 2, 6)]
    above = prefix_jaccard_pairs(
        df, shingle_n=3, t_num=34, t_den=100
    ).collect()
    assert above == []


def test_partitioning_invariance(spark, corpus):
    a = sorted(map(tuple, prefix_jaccard_pairs(
        corpus.repartition(1), t_num=1, t_den=2).collect()))
    b = sorted(map(tuple, prefix_jaccard_pairs(
        corpus.repartition(13), t_num=1, t_den=2).collect()))
    assert a == b


def test_threshold_guard(spark, corpus):
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(corpus, t_num=0, t_den=1)
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(corpus, t_num=3, t_den=2)
