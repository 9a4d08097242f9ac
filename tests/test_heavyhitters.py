"""Heavy hitters: exact-top-k equality on skewed streams in the
m < distinct regime, MG undercount bound, lower-bound property,
completeness certificate both ways, partitioning invariance, NULL
exclusion, guards."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_partition_summaries,
    mg_reduce,
)


def _zipf_rows(n_keys=200, total=6000, seed=7):
    rng = random.Random(seed)
    keys = []
    for i in range(1, n_keys + 1):
        keys.extend([f"k{i:04d}"] * max(1, total // (i * i)))
    rng.shuffle(keys)
    return [(j, k) for j, k in enumerate(keys)]


@pytest.fixture(scope="module")
def zipf(spark):
    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "id long, key string").repartition(8)
    truth = Counter(k for _, k in rows)
    return df, truth


def test_topk_exact_on_skew(zipf):
    df, truth = zipf
    # m=32 << 200 distinct keys — the interesting regime
    got = heavy_hitters(df, "key", k=5, m=32).collect()
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.key, r.n) for r in got] == want


def test_certificate_true_on_skew(zipf):
    # k=4: the 4th count (375) clears N/(m+1) ~ 299; k=5 would not
    df, truth = zipf
    rows = heavy_hitters(df, "key", k=4, m=32, with_guarantee=True).collect()
    assert all(r.provably_complete for r in rows)
    # and the certificate is honest: 4th count really above N/(m+1)
    n = sum(truth.values())
    assert rows[-1].n * 33 > n


def test_certificate_matches_formula(zipf):
    # k=5's smallest count (240) is BELOW the bound: certificate must
    # be False even though the top-5 happens to be exact
    df, truth = zipf
    rows = heavy_hitters(df, "key", k=5, m=32, with_guarantee=True).collect()
    n = sum(truth.values())
    want = min(r.n for r in rows) * 33 > n
    assert want is False
    assert all(r.provably_complete == want for r in rows)


def test_certificate_false_on_flat(spark):
    # 100 keys x 10 each: no key above N/(m+1) = 1000/17
    rows = [(i, f"u{i % 100:03d}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, key string").repartition(4)
    out = heavy_hitters(df, "key", k=3, m=16, with_guarantee=True).collect()
    assert all(not r.provably_complete for r in out)


def test_mg_bound_single_partition(zipf):
    df, truth = zipf
    m = 32
    summ = {
        r.key: r.mg
        for r in mg_partition_summaries(df.coalesce(1), "key", m).collect()
    }
    n = sum(truth.values())
    assert len(summ) <= m
    for k, mg in summ.items():
        assert mg <= truth[k]  # never overcounts
        assert truth[k] - mg <= n // (m + 1)  # undercount bound
    # every key above the threshold survives
    for k, c in truth.items():
        if c > n / (m + 1):
            assert k in summ


def test_merged_candidates_lower_bound(zipf):
    df, truth = zipf
    cands = mg_reduce(mg_partition_summaries(df, "key", 32), 32).collect()
    for r in cands:
        assert r.mg <= truth[r.key]


def test_partitioning_invariance(zipf):
    df, _ = zipf
    a = [(r.key, r.n) for r in heavy_hitters(df.repartition(1), "key", 5, m=32).collect()]
    b = [(r.key, r.n) for r in heavy_hitters(df.repartition(13), "key", 5, m=32).collect()]
    assert a == b


def test_null_keys_excluded(spark):
    rows = [(0, "a"), (1, "a"), (2, None), (3, "b"), (4, None), (5, None)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = heavy_hitters(df, "key", k=2, m=4).collect()
    assert [(r.key, r.n) for r in got] == [("a", 2), ("b", 1)]


def test_small_m_all_keys_exact(spark):
    # m >= distinct: summaries are exact counts, top-k trivially exact
    rows = [(i, f"x{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, key string").repartition(3)
    got = heavy_hitters(df, "key", k=5, m=64).collect()
    assert all(r.n == 10 for r in got)
    assert [r.key for r in got] == ["x0", "x1", "x2", "x3", "x4"]


def test_guards(spark):
    df = spark.createDataFrame([(1, "a")], "id long, key string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", 0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", 10, m=5)
    with pytest.raises(ValueError):
        mg_partition_summaries(df, "key", 0)
