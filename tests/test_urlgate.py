"""URL-level quality gate (operators/urlgate.py): per-rule trips,
feature extraction edges, digit-ratio integer boundary, banned
substring counting, NULL totality, partitioning invariance."""

from pyspark.sql import functions as F

from wos_crawler_spark.operators.urlgate import (
    url_features,
    url_quality_gate,
)


def _gate(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"]: r for r in url_quality_gate(df, **kw).collect()}


def test_each_rule_trips_individually(spark):
    long_url = "https://a.com/" + "x" * 3000
    deep = "https://a.com/" + "/".join(f"s{i}" for i in range(20))
    query = "https://a.com/p?" + "&".join(f"k{i}=v" for i in range(12))
    digits = "https://a.com/2024/01/02/0123456789/9876543210"
    asset = "https://a.com/theme/style.CSS"
    banned = "https://a.com/free-casino-poker"
    good = "https://a.com/articles/science/quantum-entanglement.html"
    out = _gate(
        spark,
        [long_url, deep, query, digits, asset, banned, good],
        banned_words=["casino", "poker"],
    )
    assert not out[long_url]["url_ok_len"] and not out[long_url]["url_keep"]
    assert not out[deep]["url_ok_depth"]
    assert not out[query]["url_ok_query"]
    assert not out[digits]["url_ok_digits"]
    assert not out[asset]["url_ok_ext"]  # case-insensitive extension
    assert out[banned]["url_n_banned"] == 2 and not out[banned]["url_keep"]
    g = out[good]
    assert g["url_keep"] and all(
        g[c]
        for c in ["url_ok_len", "url_ok_depth", "url_ok_query",
                  "url_ok_digits", "url_ok_ext"]
    )
    # html is not a blocked extension
    assert g["url_ok_ext"]


def test_digit_ratio_integer_boundary_and_features(spark):
    # path '/12345/abc' → 5 digits / 10 chars: 5*2 <= 10*1 passes AT
    # the boundary; '/123456/ab' → 6/10: 6*2 > 10 fails — exactly the
    # integer cross-multiply, no float epsilon anywhere
    ok = "https://a.com/12345/abc"
    bad = "https://a.com/123456/ab"
    out = _gate(spark, [ok, bad])
    assert out[ok]["url_ok_digits"] and not out[bad]["url_ok_digits"]
    df = spark.createDataFrame(
        [("https://a.com/a/b/c.tar.gz?x=1&y=2#frag",)], "url string"
    )
    f = df.select(url_features(F.col("url")).alias("f")).first()["f"]
    assert f["path_depth"] == 3
    assert f["ext"] == "gz"  # last dot segment
    assert f["n_query_params"] == 2  # fragment not counted
    # extension only from the LEAF: dots in directories don't count
    f2 = (
        spark.createDataFrame([("https://a.com/v1.2/page",)], "url string")
        .select(url_features(F.col("url")).alias("f"))
        .first()["f"]
    )
    assert f2["ext"] == ""


def test_null_url_fails_totally_and_invariance(spark):
    df = spark.createDataFrame(
        [(None,), ("https://a.com/ok",)], "url string"
    )
    rows = {r["url"]: r for r in url_quality_gate(df).collect()}
    nrow = rows[None]
    assert nrow["url_keep"] is False and nrow["url_ok_len"] is False
    a = sorted(
        map(tuple, url_quality_gate(df.repartition(1)).collect()),
        key=str,
    )
    b = sorted(
        map(tuple, url_quality_gate(df.repartition(5)).collect()),
        key=str,
    )
    assert a == b
