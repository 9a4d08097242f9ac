"""fastText-style hashed-ngram classifier (operators/textclassify.py):
Arrow ≡ expr flavor pinning, hand-computed feature counts, integer
keep threshold, NULL/empty-text edge semantics."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textclassify import (
    classifier_features,
    classifier_score,
    classifier_score_expr,
    weights_from_table,
)

NB = 512


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "the the the"),
        (2, "single"),
        (3, ""),
        (4, None),
        (5, "Tabs\tand  MULTI   spaces\nnewlines"),
        (6, "unicode tökens blend ünïcode"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def weights_df(spark):
    # deterministic synthetic milli-weights in [-1000, 1000]
    return spark.range(NB).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * 2654435761) % 2001 - 1000).cast("long").alias("weight"),
    )


def test_feature_counts(spark, docs):
    """n unigrams + (n-1) bigrams; empty text = 1 empty-string
    unigram; NULL text drops."""
    feats = classifier_features(docs, n_buckets=NB)
    counts = {
        r["doc_id"]: r["n"]
        for r in feats.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {0: 7, 1: 5, 2: 1, 3: 1, 5: 9, 6: 7}


def test_bucket_matches_python_md5(spark, docs):
    feats = classifier_features(
        docs.filter("doc_id = 0"), n_buckets=NB
    ).collect()
    toks = ["the", "quick", "brown", "fox"]
    expected = sorted(
        int.from_bytes(hashlib.md5(f.encode()).digest()[:4], "big") % NB
        for f in toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    )
    assert sorted(r["bucket"] for r in feats) == expected


def test_arrow_equals_expr(spark, docs, weights_df):
    expr = {
        r["doc_id"]: (r["w_sum"], r["n_feat"], r["clf_keep"])
        for r in classifier_score_expr(
            docs, weights_df, n_buckets=NB
        ).collect()
    }
    vec = weights_from_table(weights_df, NB)
    arrow = {
        r["doc_id"]: (r["w_sum"], r["n_feat"], r["clf_keep"])
        for r in classifier_score(docs, vec, n_buckets=NB).collect()
    }
    assert arrow == expr
    assert set(expr) == {0, 1, 2, 3, 5, 6}  # NULL text dropped in both


def test_arrow_preserves_input_columns(spark, docs, weights_df):
    vec = weights_from_table(weights_df, NB)
    out = classifier_score(docs, vec, n_buckets=NB)
    assert {"doc_id", "text", "w_sum", "n_feat", "clf_keep", "clf_score"} <= set(
        out.columns
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[0] == "the quick brown fox"


def test_integer_threshold_and_score(spark, docs, weights_df):
    vec = weights_from_table(weights_df, NB)
    rows = classifier_score(
        docs, vec, n_buckets=NB, threshold_milli=100
    ).collect()
    for r in rows:
        assert r["clf_keep"] == (r["w_sum"] > r["n_feat"] * 100)
        mean = r["w_sum"] / (r["n_feat"] * 1000.0)
        assert abs(r["clf_score"] - 1.0 / (1.0 + np.exp(-mean))) < 1e-12


def test_weights_length_guard(spark, weights_df):
    vec = weights_from_table(weights_df, NB)
    with pytest.raises(ValueError, match="buckets"):
        classifier_score(None, vec, n_buckets=NB * 2)


def test_weights_bucket_range_guard(spark):
    bad = spark.createDataFrame([(-1, 5)], "bucket long, weight long")
    with pytest.raises(ValueError, match="outside"):
        weights_from_table(bad, NB)
    big = spark.createDataFrame([(NB, 5)], "bucket long, weight long")
    with pytest.raises(ValueError, match="outside"):
        weights_from_table(big, NB)
