"""Hashed trigram LM scoring (CCNet-style gate): exact-count
training, the nano-quantized log-prob protocol vs a pure-python
twin, expr ≡ arrow bit-equality, unscored short docs, bucket labels,
and partitioning invariance."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.lmscore import (
    NANO,
    lm_bucket,
    lm_score,
    lm_score_arrow,
    lm_train,
)

M = 512
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _toks(t):
    return [w for w in _WS.sub(" ", t.lower()).strip(" ").split(" ") if w]


def _bucket(s):
    return (
        int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") % M
    )


def _py_model(ref_texts):
    c3, c2 = {}, {}
    for t in ref_texts:
        w = _toks(t)
        for i in range(len(w) - 2):
            b = _bucket("lm3:" + " ".join(w[i : i + 3]))
            c3[b] = c3.get(b, 0) + 1
        for i in range(len(w) - 1):
            b = _bucket("lm2:" + w[i] + " " + w[i + 1])
            c2[b] = c2.get(b, 0) + 1
    return c3, c2


def _py_score(t, c3, c2):
    w = _toks(t)
    if len(w) < 3:
        return None
    lp = 0
    for i in range(len(w) - 2):
        n3 = c3.get(_bucket("lm3:" + " ".join(w[i : i + 3])), 0)
        n2 = c2.get(_bucket("lm2:" + w[i] + " " + w[i + 1]), 0)
        lp += math.floor(
            (math.log(n3 + 1.0) - math.log(n2 + float(M))) * NANO
        )
    n = len(w) - 2
    return n, lp, math.floor(lp / n)


@pytest.fixture(scope="module")
def corpus(spark):
    ref = [
        "the cat sat on the mat",
        "the cat sat on the chair",
        "a dog ran in the park",
    ]
    docs = [
        (0, "the cat sat on the mat"),  # in-domain → best fit
        (1, "a dog ran in the park today"),
        (2, "zq xv wk yj totally out of domain gibberish tokens"),
        (3, "two words"),  # < 3 tokens → unscored
        (4, ""),  # empty → unscored
        (5, None),  # null → unscored
    ]
    ref_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref)], "doc_id long, text string"
    ).repartition(3)
    doc_df = spark.createDataFrame(
        docs, "doc_id long, text string"
    ).repartition(4)
    return ref, docs, ref_df.cache(), doc_df.cache()


def test_matches_python_twin(spark, corpus):
    ref, docs, ref_df, doc_df = corpus
    c3, c2 = lm_train(ref_df, n_buckets=M)
    got = {
        r["doc_id"]: (r["n_tri"], r["lp_nano"], r["avg_nano"])
        for r in lm_score(doc_df, c3, c2, n_buckets=M).collect()
    }
    pc3, pc2 = _py_model(ref)
    # spark counts == python counts
    assert {tuple(r) for r in c3.collect()} == set(pc3.items())
    assert {tuple(r) for r in c2.collect()} == set(pc2.items())
    for i, t in docs:
        exp = _py_score(t, pc3, pc2) if isinstance(t, str) else None
        if exp is None:
            assert i not in got, i
        else:
            assert got[i] == exp, i
    # in-domain doc scores strictly better than gibberish
    assert got[0][2] > got[2][2]


def test_arrow_twin_bit_equal(spark, corpus):
    _, _, ref_df, doc_df = corpus
    c3, c2 = lm_train(ref_df, n_buckets=M)
    e = sorted(
        map(tuple, lm_score(doc_df, c3, c2, n_buckets=M).collect())
    )
    a = sorted(
        map(
            tuple,
            lm_score_arrow(doc_df, c3, c2, n_buckets=M).collect(),
        )
    )
    assert a == e


def test_bucket_labels(spark, corpus):
    _, _, ref_df, doc_df = corpus
    c3, c2 = lm_train(ref_df, n_buckets=M)
    s = lm_score(doc_df, c3, c2, n_buckets=M)
    rows = {r["doc_id"]: r["avg_nano"] for r in s.collect()}
    cuts = sorted(rows.values())
    head_cut, tail_cut = cuts[-1], cuts[-1]  # only the best is head
    lab = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm_bucket(s, head_cut, tail_cut).collect()
    }
    assert lab[0] == "head"
    assert lab[2] == "tail" or lab[2] == "middle"
    with pytest.raises(ValueError):
        lm_bucket(s, 0, 1)


def test_partitioning_invariance(spark, corpus):
    _, _, ref_df, doc_df = corpus
    c3, c2 = lm_train(ref_df.repartition(1), n_buckets=M)
    a = sorted(
        map(
            tuple,
            lm_score(
                doc_df.repartition(1), c3, c2, n_buckets=M
            ).collect(),
        )
    )
    c3b, c2b = lm_train(ref_df.repartition(7), n_buckets=M)
    b = sorted(
        map(
            tuple,
            lm_score(
                doc_df.repartition(9), c3b, c2b, n_buckets=M
            ).collect(),
        )
    )
    assert a == b
