"""HyperLogLog sketches: bit-exact python twin (buckets, rhos,
registers, the full estimate), merge ≡ union-of-inputs, duplicate
insensitivity, grouped estimates, accuracy in both formula branches,
and the p guard."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.sketches import (
    hll_alpha,
    hll_count_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _py_sketch(keys, p, salt=""):
    m = 1 << p
    regs = {}
    for k in keys:
        h = hashlib.md5((str(k) + salt).encode()).hexdigest()
        b = int(h[:8], 16) % m
        w = int(h[8:16], 16)
        rho = 33 if w == 0 else 33 - len(bin(w)[2:])
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_est(regs, p):
    m = 1 << p
    hsum = sum(2.0 ** -r for r in regs.values()) + (m - len(regs)) * 1.0
    raw = hll_alpha(p) * float(m) * float(m) / hsum
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return math.floor(float(m) * math.log(float(m) / zeros))
    return math.floor(raw)


def test_registers_match_python_twin(spark):
    keys = [f"https://h{i % 9}.ex/p/{i}" for i in range(800)]
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    got = {
        (r["bucket"], r["rho"])
        for r in hll_registers(df, "url", p=8).collect()
    }
    assert got == set(_py_sketch(keys, 8).items())


def test_estimate_both_branches_match_twin_and_truth(spark):
    keys = [f"u{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    # p=12: linear-counting branch (m >> n)
    # p=6 : raw harmonic branch (n >> 2.5m)
    for p, tol in ((12, 0.10), (6, 0.40)):
        est = hll_count_distinct(df, "url", p=p).first()["est"]
        assert est == _py_est(_py_sketch(keys, p), p), p
        assert abs(est - 2000) / 2000 < tol, (p, est)


def test_duplicates_change_nothing(spark):
    base = [(f"k{i}",) for i in range(500)]
    a = spark.createDataFrame(base, "url string")
    b = spark.createDataFrame(base * 3, "url string").repartition(7)
    ra = sorted(map(tuple, hll_registers(a, "url", p=9).collect()))
    rb = sorted(map(tuple, hll_registers(b, "url", p=9).collect()))
    assert ra == rb


def test_merge_equals_union(spark):
    k1 = [(f"a{i}",) for i in range(400)]
    k2 = [(f"b{i}",) for i in range(300)]  # disjoint
    d1 = spark.createDataFrame(k1, "url string")
    d2 = spark.createDataFrame(k2, "url string")
    merged = hll_merge(
        hll_registers(d1, "url", p=10), hll_registers(d2, "url", p=10)
    )
    direct = hll_registers(d1.unionByName(d2), "url", p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    e = hll_estimate(merged, p=10).first()["est"]
    assert abs(e - 700) / 700 < 0.15


def test_grouped_estimates(spark):
    rows = [(f"h{i % 4}", f"u{i}") for i in range(1200)]
    df = spark.createDataFrame(rows, "host string, url string")
    got = {
        r["host"]: r["est"]
        for r in hll_count_distinct(
            df, "url", p=10, group_cols=["host"]
        ).collect()
    }
    assert set(got) == {"h0", "h1", "h2", "h3"}
    for h in got:
        truth = len({u for hh, u in rows if hh == h})
        assert abs(got[h] - truth) / truth < 0.15, (h, got[h], truth)


def test_p_guard(spark):
    df = spark.createDataFrame([("x",)], "url string")
    for bad in (3, 19):
        with pytest.raises(ValueError):
            hll_registers(df, "url", p=bad)
