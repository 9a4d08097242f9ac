"""Count-min sketch: bit-exact python twin, the never-undercount
guarantee, exactness when width dominates the key space, weighted
counting, linear merge, partitioning invariance, guards."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.sketches import (
    cms_lookup,
    cms_merge,
    cms_table,
)

D, W = 3, 64


def _py_bucket(k, r, width=W, salt="cms"):
    h = hashlib.md5((str(k) + f"{salt}{r}").encode()).hexdigest()
    return int(h[:8], 16) % width


def _py_table(keys, depth=D, width=W):
    t = {}
    for k in keys:
        for r in range(depth):
            b = _py_bucket(k, r, width)
            t[(r, b)] = t.get((r, b), 0) + 1
    return t


def _py_est(t, k, depth=D):
    return min(t.get((r, _py_bucket(k, r)), 0) for r in range(depth))


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish: key i appears (60 - i) times for i in 0..59
    keys = [f"u{i}" for i in range(60) for _ in range(60 - i)]
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    return keys, df.repartition(6).cache()


def test_table_and_lookup_match_python_twin(spark, stream):
    keys, df = stream
    t = cms_table(df, "url", depth=D, width=W)
    assert {(r["row"], r["bucket"]): r["c"] for r in t.collect()} == \
        _py_table(keys)
    probes = spark.createDataFrame(
        [(f"u{i}",) for i in range(60)] + [("absent",)], "url string"
    )
    got = {
        r["url"]: r["est"]
        for r in cms_lookup(t, probes, "url", depth=D, width=W).collect()
    }
    pt = _py_table(keys)
    truth = {f"u{i}": 60 - i for i in range(60)}
    for k, est in got.items():
        assert est == _py_est(pt, k), k
        # CM never undercounts
        assert est >= truth.get(k, 0), k


def test_exact_when_wide(spark, stream):
    keys, df = stream
    t = cms_table(df, "url", depth=4, width=8192)
    probes = spark.createDataFrame(
        [(f"u{i}",) for i in range(60)], "url string"
    )
    got = {
        r["url"]: r["est"]
        for r in cms_lookup(t, probes, "url", depth=4, width=8192).collect()
    }
    assert got == {f"u{i}": 60 - i for i in range(60)}


def test_weighted_and_merge_linear(spark):
    rows = [(f"k{i % 5}", i % 3 + 1) for i in range(90)]
    df = spark.createDataFrame(rows, "url string, w int")
    half1 = df.filter(F.col("w") <= 2)
    half2 = df.filter(F.col("w") > 2)
    full = cms_table(df, "url", depth=D, width=W, weight_col="w")
    merged = cms_merge(
        cms_table(half1, "url", depth=D, width=W, weight_col="w"),
        cms_table(half2, "url", depth=D, width=W, weight_col="w"),
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_partitioning_invariance(spark, stream):
    keys, df = stream
    a = sorted(map(tuple, cms_table(
        df.repartition(1), "url", depth=D, width=W).collect()))
    b = sorted(map(tuple, cms_table(
        df.repartition(17), "url", depth=D, width=W).collect()))
    assert a == b


def test_guards(spark, stream):
    _, df = stream
    with pytest.raises(ValueError):
        cms_table(df, "url", depth=0)
    with pytest.raises(ValueError):
        cms_table(df, "url", width=1)
