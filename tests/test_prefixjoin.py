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


# ------------------------------------------------------- cross-corpus A×B


def _brute_cross(spark, left, right, n, t_num, t_den):
    def sets(df):
        return df.select(
            F.col("doc_id").alias("_id"), words_of(F.col("text")).alias("_w")
        ).select("_id", shingles_from_words(F.col("_w"), n).alias("_s"))

    a = sets(left).select(F.col("_id").alias("id_l"), F.col("_s").alias("sl"))
    b = sets(right).select(F.col("_id").alias("id_r"), F.col("_s").alias("sr"))
    inter = F.size(F.array_intersect("sl", "sr"))
    union = F.size("sl") + F.size("sr") - inter
    return sorted(
        map(
            tuple,
            a.crossJoin(b)
            .withColumn("n_inter", inter.cast("long"))
            .withColumn("n_union", union.cast("long"))
            .filter(F.col("n_inter") * t_den >= F.col("n_union") * t_num)
            .select("id_l", "id_r", "n_inter", "n_union")
            .collect(),
        )
    )


@pytest.fixture(scope="module")
def two_corpora(spark, corpus):
    # right = standing training set; left = "today's crawl": some docs
    # near-dup of right docs, some near-dup of EACH OTHER ONLY (must
    # not pair — within-side dups are not the cross join's business),
    # some fresh
    base = {r["doc_id"]: r["text"] for r in corpus.collect()}
    left_rows = []
    w0 = base[0].split()
    w0[3] = "edit0"
    left_rows.append((1000, " ".join(w0)))          # near-dup of right 0
    left_rows.append((1001, base[7]))               # exact dup of right 7
    left_rows.append((1002, " ".join(f"fresh{i}" for i in range(40))))
    left_rows.append((1003, " ".join(f"fresh{i}" for i in range(40))))
    # 1002/1003 are identical to each other but match nothing on the right
    left_rows.append((1004, ""))                    # empty
    left = spark.createDataFrame(
        left_rows, "doc_id long, text string"
    ).repartition(3).cache()
    return left, corpus


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (4, 5)])
def test_cross_join_complete_vs_brute_force(spark, two_corpora, t_num, t_den):
    from wos_crawler_spark.operators.textdedup import prefix_jaccard_join

    left, right = two_corpora
    got = sorted(
        map(
            tuple,
            prefix_jaccard_join(
                left, right, shingle_n=3, t_num=t_num, t_den=t_den
            ).collect(),
        )
    )
    want = _brute_cross(spark, left, right, 3, t_num, t_den)
    assert got == want and len(want) >= 2
    # the within-left exact pair (1002, 1003) must NOT appear anywhere
    ids = {i for p in got for i in p[:2]}
    assert 1002 not in ids and 1003 not in ids


def test_cross_join_partitioning_invariance_and_guard(spark, two_corpora):
    from wos_crawler_spark.operators.textdedup import prefix_jaccard_join

    left, right = two_corpora
    a = sorted(map(tuple, prefix_jaccard_join(left.repartition(1), right.repartition(1)).collect()))
    b = sorted(map(tuple, prefix_jaccard_join(left.repartition(13), right.repartition(7)).collect()))
    assert a == b
    with pytest.raises(ValueError):
        prefix_jaccard_join(left, right, t_num=3, t_den=2)


def test_anti_join_near_dups_admission_gate(spark, two_corpora):
    from wos_crawler_spark.operators.textdedup import anti_join_near_dups

    left, right = two_corpora
    kept = anti_join_near_dups(left, right, t_num=1, t_den=2)
    ids = {r["doc_id"] for r in kept.collect()}
    # 1000 (near-dup of 0) and 1001 (exact dup of 7) are refused; the
    # empty left doc 1004 is ALSO refused because the standing corpus
    # contains an empty doc (203) and empty docs shingle to the same
    # singleton set — J = 1, the dedup family's documented convention;
    # fresh docs are admitted and left columns pass through
    assert ids == {1002, 1003}
    assert set(kept.columns) == {"doc_id", "text"}
