"""DSIR importance resampling (operators/dsir.py): python-twin parity
under the nano-quantization protocol, selection-shifts-toward-target
semantics, partitioning invariance, empty-doc exclusion."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.dsir import (
    bucket_counts,
    dsir_log_weights,
    dsir_resample,
    dsir_scores,
)

M = 256  # small bucket table so collisions are exercised
_DENOM = float(1 << 32)

# two vocab styles: science-y (target-like) and spam-y
SCI = "data model spark query result method value table scan merge"
SPAM = "buy cheap now click free offer win prize deal sale"


def _doc(i, style):
    ws = style.split()
    return " ".join(ws[(i * 3 + j) % len(ws)] for j in range(8))


RAW = [(i, _doc(i, SCI if i % 2 == 0 else SPAM)) for i in range(60)] + [
    (100, ""),
    (101, None),
]
TARGET = [(1000 + i, _doc(i, SCI)) for i in range(20)]


def _words(t):
    import re

    t = re.sub(r"\s+", " ", (t or "").lower()).strip()
    return [w for w in t.split(" ") if w]


def _feats(t):
    ws = _words(t)
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _bucket(f):
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % M


def _counts(docs):
    c = {}
    for _, t in docs:
        for f in _feats(t):
            b = _bucket(f)
            c[b] = c.get(b, 0) + 1
    return c


def _twin(raw, target, k, salt="dsir"):
    ct, cr = _counts(target), _counts(raw)
    n_t, n_r = sum(ct.values()), sum(cr.values())
    w = {
        b: math.floor(
            (
                math.log(float(ct.get(b, 0) + 1))
                - math.log(float(n_t) + float(M))
                - math.log(float(c + 1))
                + math.log(float(n_r) + float(M))
            )
            * 1e9
        )
        for b, c in cr.items()
    }
    rows = []
    for d, t in raw:
        fs = _feats(t)
        if not fs:
            continue
        logw = sum(w[_bucket(f)] for f in fs)
        h = float(int(hashlib.md5((str(d) + salt).encode()).hexdigest()[:8], 16))
        u = (h + 0.5) / _DENOM
        g = math.floor(-math.log(-math.log(u)) * 1e9)
        rows.append((d, len(fs), logw, logw + g))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [(d, nf, lw, kn, i + 1) for i, (d, nf, lw, kn) in enumerate(rows[:k])]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_bucket_counts_match_twin(spark, frames):
    raw, _ = frames
    got = {
        r["bucket"]: r["c"]
        for r in bucket_counts(raw, n_buckets=M).collect()
    }
    assert got == _counts(RAW)


def test_resample_matches_python_twin(spark, frames):
    raw, target = frames
    got = sorted(
        map(tuple, dsir_resample(raw, target, k=15, n_buckets=M).collect()),
        key=lambda r: r[4],
    )
    assert got == _twin(RAW, TARGET, 15)


def test_selection_shifts_toward_target(spark, frames):
    raw, target = frames
    sel = [
        r["doc_id"]
        for r in dsir_resample(raw, target, k=20, n_buckets=M).collect()
    ]
    sci = sum(1 for d in sel if d % 2 == 0)
    assert sci >= 16  # overwhelmingly science-style docs


def test_empty_docs_never_selected(spark, frames):
    raw, target = frames
    sel = {
        r["doc_id"]
        for r in dsir_resample(raw, target, k=62, n_buckets=M).collect()
    }
    assert 100 not in sel and 101 not in sel


def test_partitioning_invariance(spark, frames):
    raw, target = frames
    a = sorted(map(tuple, dsir_resample(
        raw.repartition(1), target, k=10, n_buckets=M).collect()))
    b = sorted(map(tuple, dsir_resample(
        raw.repartition(7), target.repartition(3), k=10,
        n_buckets=M).collect()))
    assert a == b


def test_arrow_twins_bit_equal(spark, frames):
    """The Arrow counting/scoring passes reproduce the expr flavor
    exactly — counts, weights, and the full resample."""
    from wos_crawler_spark.operators.dsir import (
        bucket_counts_arrow,
        dsir_scores_arrow,
    )

    raw, target = frames
    ce = sorted(map(tuple, bucket_counts(raw, n_buckets=M).collect()))
    ca = sorted(map(tuple, bucket_counts_arrow(raw, n_buckets=M).collect()))
    assert ca == ce

    we = sorted(map(tuple, dsir_log_weights(
        target, raw, n_buckets=M).collect()))
    wa = sorted(map(tuple, dsir_log_weights(
        target, raw, n_buckets=M, use_arrow=True).collect()))
    assert wa == we

    w = dsir_log_weights(target, raw, n_buckets=M)
    se = sorted(map(tuple, dsir_scores(raw, w, n_buckets=M).collect()))
    sa = sorted(map(tuple, dsir_scores_arrow(raw, w, n_buckets=M).collect()))
    assert sa == se

    re_ = sorted(map(tuple, dsir_resample(
        raw, target, k=15, n_buckets=M).collect()))
    ra = sorted(map(tuple, dsir_resample(
        raw, target, k=15, n_buckets=M, use_arrow=True).collect()))
    assert ra == re_


def test_weights_cover_exactly_raw_buckets(spark, frames):
    raw, target = frames
    w = dsir_log_weights(target, raw, n_buckets=M)
    assert {r["bucket"] for r in w.collect()} == set(_counts(RAW))
    # every scored doc's weight sum is reproducible
    s = dsir_scores(raw, w, n_buckets=M)
    assert s.filter(F.col("logw_nano").isNull()).count() == 0
