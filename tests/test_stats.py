"""Exact value-counting quantiles (operators/stats.py): equality with
python's inverse-ECDF (percentile_disc semantics), NULL exclusion,
duplicate-heavy distributions, p=1 is the max, partitioning
invariance, guards."""

import math

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.stats import value_quantiles


def _py_q(vals, num, den):
    s = sorted(vals)
    rank = -(-num * len(s) // den)  # ceil
    return s[rank - 1]


PS = [(1, 10), (1, 4), (1, 2), (3, 4), (9, 10), (1, 1)]


def test_quantiles_match_python_inverse_ecdf(spark):
    rows = []
    for i in range(500):
        rows.append((i, "a", (i * 7) % 50))       # heavy duplicates
    for i in range(100):
        rows.append((1000 + i, "b", i * i))       # skewed spacing
    rows.append((2000, "b", None))                # excluded
    df = spark.createDataFrame(rows, "id long, src string, v long")
    got = {
        (r["stratum"], r["p_num"], r["p_den"]): (r["n"], r["q"])
        for r in value_quantiles(df.repartition(7), "src", "v", PS).collect()
    }
    a_vals = [(i * 7) % 50 for i in range(500)]
    b_vals = [i * i for i in range(100)]
    for num, den in PS:
        assert got[("a", num, den)] == (500, _py_q(a_vals, num, den))
        assert got[("b", num, den)] == (100, _py_q(b_vals, num, den))
    # p = 1 is the max; partitioning invariance
    assert got[("b", 1, 1)][1] == 99 * 99
    got1 = {
        (r["stratum"], r["p_num"], r["p_den"]): (r["n"], r["q"])
        for r in value_quantiles(df.repartition(1), "src", "v", PS).collect()
    }
    assert got == got1


def test_quantiles_single_value_and_guard(spark):
    df = spark.createDataFrame(
        [(1, "x", 42), (2, "x", 42)], "id long, src string, v long"
    )
    out = value_quantiles(df, "src", "v", [(1, 2), (1, 1)]).collect()
    assert {r["q"] for r in out} == {42}
    with pytest.raises(ValueError):
        value_quantiles(df, "src", "v", [(0, 2)])
    with pytest.raises(ValueError):
        value_quantiles(df, "src", "v", [(3, 2)])
