"""Winnowing fingerprints: coverage guarantee (shared substring ≥
w+k-1 chars ⇒ shared fingerprint), python-twin equality, short-doc
degeneracy, pair blocking + bucket cap."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.winnow import (
    winnow_fingerprint_set,
    winnow_fingerprints,
    winnow_pairs,
)


def _twin(text, k=5, w=4):
    """Pure-python mirror of winnow_fingerprint_set."""
    n = re.sub(r"\s+", " ", text.lower()).strip()
    grams = [n[i:i + k] for i in range(max(len(n) - k + 1, 1))]
    hs = [
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
        for g in grams
    ]
    mins = [min(hs[j:j + w]) for j in range(max(len(hs) - w + 1, 1))]
    out = []
    for m in mins:
        if m not in out:
            out.append(m)
    return out


def _set_of(spark, text, k=5, w=4):
    return (
        spark.range(1)
        .select(winnow_fingerprint_set(F.lit(text), k=k, w=w).alias("s"))
        .first()
        .s
    )


def test_twin_equality(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "A  Mixed   CASE\ttext\nwith   messy whitespace",
        "short",
        "abcd",            # shorter than k → single whole-text gram
        "ünïcodé çhärs ünïcodé çhärs repeated",
        "x" * 40,          # constant text → one distinct hash
    ]
    for t in texts:
        assert _set_of(spark, t) == _twin(t), t


def test_coverage_guarantee(spark):
    """Any shared substring of length ≥ w+k-1 (=8) must yield at least
    one shared fingerprint (Schleimer et al. 2003, theorem in §3)."""
    shared = "zqxjwvkf"  # 8 chars, appears verbatim in both
    a = set(_set_of(spark, f"left context {shared} tail one"))
    b = set(_set_of(spark, f"totally different {shared} other end"))
    assert a & b


def test_pairs_and_cap(spark):
    boiler = "copyright acme corp all rights reserved " * 2
    rows = [
        (1, boiler + "page one unique body text here"),
        (2, boiler + "page two другое содержание страницы"),
        (3, "completely unrelated document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_pairs(df, min_shared=2).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].n_shared >= 2
    # cap of 0-sized buckets removes everything
    assert winnow_pairs(df, min_shared=1, bucket_cap=1).count() == 0


def test_fingerprints_shape(spark):
    df = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    fps = winnow_fingerprints(df)
    assert fps.columns == ["doc_id", "fp"]
    vals = [r.fp for r in fps.collect()]
    assert len(vals) == len(set(vals))  # distinct per doc
    assert all(isinstance(v, int) for v in vals)


def test_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    # NULL text → no fingerprint rows; empty text → fingerprints of ''
    got = winnow_fingerprints(df).groupBy("doc_id").count().collect()
    assert {r.doc_id for r in got} <= {2}


def test_arrow_expr_bit_equality(spark):
    """The Arrow scale path and the Catalyst-expr oracle twin emit
    identical (id, fp) row sets — incl. unicode, NBSP (Java \\s vs
    python unicode \\s trap), CRLF, short and empty docs."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "A  Mixed   CASE\ttext\r\nwith  messy\x0b whitespace"),
        (3, "nbsp stays joined unlike ascii space"),
        (4, "ünïcodé çhärs ünïcodé çhärs repeated"),
        (5, "ab"),
        (6, ""),
        (7, None),
        (8, "x" * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = winnow_fingerprints(df, use_arrow=True)
    expr = winnow_fingerprints(df, use_arrow=False)
    a = sorted(map(tuple, arrow.collect()))
    e = sorted(map(tuple, expr.collect()))
    assert a == e and len(a) > 0
