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


def test_corpus_datacard(spark):
    from wos_crawler_spark.operators.stats import corpus_datacard

    rows = [
        (0, "hello world", "en"),
        (1, "hello  world", "en"),   # normalizes equal to doc 0 -> dup
        (2, "unique text here", "de"),
        (3, None, "en"),
        (4, "short", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    card = {r.metric: r.value for r in corpus_datacard(df).collect()}
    assert card["n_docs"] == 5
    assert card["n_null_text"] == 1
    assert card["n_langs"] == 2
    assert card["n_exact_dup"] == 1            # docs 0/1 collapse
    assert card["lang:en"] == 3 and card["lang:de"] == 1
    lens = sorted(
        len(t.encode()) for _, t, _ in rows if t is not None
    )  # [5, 11, 12, 16]
    assert card["len_p50"] == lens[1]          # ceil(0.5*4)=2nd
    assert card["len_p90"] == lens[3]          # ceil(0.9*4)=4th
    assert card["total_bytes"] == sum(lens)
