"""Redirect-chain resolution (path doubling): exact hop counts,
terminal detection, cycle/self-loop/over-cap refusal, the functional
guard, and partitioning invariance — checked against a pure-python
walker on the same edge set."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.redirects import (
    assert_functional,
    resolve_redirects,
)


def spark_df(planted):
    return planted[1]


def _walk(edges: dict, src, max_hops):
    cur, hops = src, 0
    while cur in edges and hops < max_hops:
        cur = edges[cur]
        hops += 1
    return (cur, hops, cur not in edges)


@pytest.fixture(scope="module")
def planted(spark):
    """Chains: u1→u0 (1 hop), u5→u4→u3→u2 (3 hops, shared suffix
    none), a 7-link chain c7→…→c0, a 2-cycle, a self-loop, and a
    40-link chain (over the default cap when max_hops=8)."""
    edges = {}
    edges["u1"] = "u0"
    for i in range(5, 2, -1):
        edges[f"u{i}"] = f"u{i-1}"
    del edges["u3"]  # u3 terminal: chain u5→u4→u3 (2 hops)
    for i in range(7, 0, -1):
        edges[f"c{i}"] = f"c{i-1}"
    edges["x"] = "y"
    edges["y"] = "x"
    edges["self"] = "self"
    for i in range(40, 0, -1):
        edges[f"L{i}"] = f"L{i-1}"
    df = spark.createDataFrame(
        sorted(edges.items()), "src string, dst string"
    ).repartition(5)
    return edges, df.cache()


def test_matches_python_walker(spark, planted):
    edges, df = planted
    for cap in (8, 32):
        got = {
            r["src"]: (r["final"], r["hops"], r["resolved"])
            for r in resolve_redirects(df, max_hops=cap).collect()
        }
        assert set(got) == set(edges)
        for s in edges:
            f, h, ok = _walk(edges, s, cap)
            if ok:
                assert got[s] == (f, h, True), s
            else:
                assert got[s][2] is False and got[s][1] is None, s


def test_exact_hops_and_terminals(spark, planted):
    _, df = planted
    got = {
        r["src"]: r
        for r in resolve_redirects(df, max_hops=32).collect()
    }
    assert (got["u1"]["final"], got["u1"]["hops"]) == ("u0", 1)
    assert (got["u5"]["final"], got["u5"]["hops"]) == ("u3", 2)
    assert (got["c7"]["final"], got["c7"]["hops"]) == ("c0", 7)
    # 40-hop chain: beyond cap 32 → refused; a 64 cap resolves it.
    assert got["L40"]["resolved"] is False
    wide = {
        r["src"]: r
        for r in resolve_redirects(
            spark_df(planted), max_hops=64
        ).collect()
    }
    assert (wide["L40"]["final"], wide["L40"]["hops"]) == ("L0", 40)
    for s in ("x", "y", "self"):
        assert got[s]["resolved"] is False
        assert got[s]["hops"] is None


def test_cap_refuses_long_chains(spark, planted):
    _, df = planted
    got = {
        r["src"]: r
        for r in resolve_redirects(df, max_hops=8).collect()
    }
    # 40-link chain: heads beyond 8 hops from L0 are refused, the
    # tail inside the cap resolves exactly.
    assert got["L40"]["resolved"] is False
    assert (got["L8"]["final"], got["L8"]["hops"]) == ("L0", 8)
    assert got["L9"]["resolved"] is False


def test_partitioning_invariance(spark, planted):
    _, df = planted
    a = sorted(
        map(tuple, resolve_redirects(df.repartition(1), max_hops=16).collect())
    )
    b = sorted(
        map(tuple, resolve_redirects(df.repartition(11), max_hops=16).collect())
    )
    assert a == b


def test_functional_guard(spark):
    bad = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="not functional"):
        assert_functional(bad)
    ok = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    assert_functional(ok)  # no raise
    with pytest.raises(ValueError):
        resolve_redirects(ok, max_hops=0)
