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


# ------------------------------------------------- trainer


def _labeled_rows():
    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append((i, f"quality content article number {i % 7} useful", 1))
        else:
            rows.append((i, f"spam casino click here win {i % 5} now", 0))
    return rows


def _twin_train(rows, nb, epochs, lr_num, lr_den):
    """Independent pure-python recomputation of the exact integer
    training protocol (the BPE _ref_train discipline)."""
    import math
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def feats(t):
        toks = ws.sub(" ", t.lower()).strip(" ").split(" ")
        return toks + [
            toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)
        ]

    def bkt(f):
        return (
            int.from_bytes(hashlib.md5(f.encode()).digest()[:4], "big") % nb
        )

    occ = {}  # (doc, bucket) -> n
    nf = {}
    y = {}
    for i, t, lab in rows:
        if t is None:
            continue
        fs = feats(t)
        if not fs:
            continue
        nf[i] = len(fs)
        y[i] = float(lab)
        for f in fs:
            occ[(i, bkt(f))] = occ.get((i, bkt(f)), 0) + 1
    n_docs = len(nf)
    w = {}
    for _ in range(epochs):
        wsum = {i: 0 for i in nf}
        for (i, b), n in occ.items():
            wsum[i] += n * w.get(b, 0)
        err = {
            i: math.floor(
                (1.0 / (1.0 + math.exp(-(float(wsum[i]) / (nf[i] * 1000.0))))
                 - y[i]) * 1e9
            )
            for i in nf
        }
        g = {}
        for (i, b), n in occ.items():
            g[b] = g.get(b, 0) + math.floor(float(err[i] * n) / nf[i])
        for b, gv in g.items():
            nw = w.get(b, 0) - math.floor(
                float(gv * lr_num) / float(n_docs * lr_den * 1_000_000)
            )
            if nw:
                w[b] = nw
            elif b in w:
                del w[b]
    return w


def test_train_matches_python_twin(spark):
    from wos_crawler_spark.operators.textclassify import (
        train_quality_classifier,
    )

    rows = _labeled_rows() + [(900, None, 1), (901, "", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    got = {
        r.bucket: r.weight
        for r in train_quality_classifier(
            df, n_buckets=NB, epochs=3, lr_num=2000, lr_den=1
        ).collect()
    }
    assert got == _twin_train(rows, NB, 3, 2000, 1)


def test_train_separates_and_feeds_both_flavors(spark):
    from wos_crawler_spark.operators.textclassify import (
        train_quality_classifier,
    )

    df = spark.createDataFrame(
        _labeled_rows(), "doc_id long, text string, label int"
    )
    w = train_quality_classifier(df, n_buckets=NB, epochs=3)
    scored = classifier_score_expr(df.select("doc_id", "text"), w, n_buckets=NB)
    acc = (
        scored.join(df.select("doc_id", "label"), "doc_id")
        .select(
            F.avg((F.col("clf_keep") == (F.col("label") == 1)).cast("double"))
        )
        .first()[0]
    )
    assert acc == 1.0  # linearly separable fixture
    # the trained table drives the Arrow scale path identically
    vec = weights_from_table(w, NB)
    arrow = classifier_score(df.select("doc_id", "text"), vec, n_buckets=NB)
    assert sorted(
        arrow.select("doc_id", "w_sum", "n_feat").collect()
    ) == sorted(scored.select("doc_id", "w_sum", "n_feat").collect())


def test_train_partitioning_invariance(spark):
    from wos_crawler_spark.operators.textclassify import (
        train_quality_classifier,
    )

    df = spark.createDataFrame(
        _labeled_rows(), "doc_id long, text string, label int"
    )
    w1 = train_quality_classifier(df.repartition(1), n_buckets=NB, epochs=2)
    w7 = train_quality_classifier(df.repartition(7), n_buckets=NB, epochs=2)
    assert sorted(w1.collect()) == sorted(w7.collect())


def test_train_guards(spark):
    from wos_crawler_spark.operators.textclassify import (
        train_quality_classifier,
    )

    df = spark.createDataFrame(
        [(0, "x", 1)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match="epochs"):
        train_quality_classifier(df, epochs=0)
    with pytest.raises(ValueError, match="rate"):
        train_quality_classifier(df, lr_num=0)
    empty = spark.createDataFrame(
        [(0, None, 1)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match="no labeled"):
        train_quality_classifier(empty, n_buckets=NB)


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
