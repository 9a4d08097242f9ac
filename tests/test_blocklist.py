"""Domain blocklist/allowlist gate: suffix semantics, case folding,
allow mode, plan shape (no frontier shuffle)."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.blocklist import (
    blocked_ids,
    blocklist_filter,
    host_suffixes,
)


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        (1, "a.b.example.com"),
        (2, "example.com"),
        (3, "ample.com"),          # substring, NOT a subdomain
        (4, "news.site.org"),
        (5, "Evil.TRACKER.net"),   # case-insensitive match
        (6, "site.org"),
    ]
    return spark.createDataFrame(rows, "id long, host string")


@pytest.fixture(scope="module")
def blocked(spark):
    return spark.createDataFrame(
        [("example.com",), ("tracker.net",)], "domain string"
    )


def test_suffixes(spark):
    df = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.com")).alias("s")
    )
    assert df.first().s == ["a.b.example.com", "b.example.com", "example.com"]
    one = spark.range(1).select(host_suffixes(F.lit("com")).alias("s")).first()
    assert one.s == ["com"]  # degenerate single-label host matches only itself


def test_block(spark, frontier, blocked):
    kept = blocklist_filter(frontier, blocked, id_col="id")
    assert sorted(r.id for r in kept.collect()) == [3, 4, 6]


def test_allow(spark, frontier, blocked):
    kept = blocklist_filter(frontier, blocked, id_col="id", mode="allow")
    assert sorted(r.id for r in kept.collect()) == [1, 2, 5]
    with pytest.raises(ValueError):
        blocklist_filter(frontier, blocked, id_col="id", mode="nope")


def test_no_frontier_shuffle(spark, frontier, blocked):
    """The gate's only exchanges are broadcast ones: the frontier rows
    themselves must never hash-repartition."""
    plan = blocklist_filter(
        frontier, blocked, id_col="id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "Broadcast" in line, line


def test_blocked_ids_distinct(spark, blocked):
    # a host matching two blocklist entries yields one id row
    f = spark.createDataFrame([(1, "x.example.com")], "id long, host string")
    bl = spark.createDataFrame(
        [("example.com",), ("x.example.com",)], "domain string"
    )
    assert blocked_ids(f, bl, id_col="id").count() == 1


# ------------------------------------------------------ registrable domain


def test_registrable_domain_psl_semantics(spark):
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.blocklist import registrable_domain

    cases = {
        "blog.shop.example.co.uk": "example.co.uk",  # multi-label suffix
        "www.example.co.uk": "example.co.uk",        # same registrant
        "example.com": "example.com",
        "a.b.example.com": "example.com",
        "user1.github.io": "user1.github.io",        # site suffix: each
        "x.user1.github.io": "user1.github.io",      # user is a registrant
        "weird.host.zz": "host.zz",                  # unknown TLD: implicit
        "com": None,                                 # a bare public suffix
        "co.uk": None,                               # has no registrant
        "EXAMPLE.Com": "example.com",                # case-folded
        "localhost": None,                           # single label
    }
    df = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).withColumn("rd", registrable_domain(F.col("host")))
    got = {r["host"]: r["rd"] for r in df.collect()}
    assert got == cases
    # NULL host → NULL
    nrow = (
        spark.createDataFrame([(None,)], "host string")
        .select(registrable_domain(F.col("host")).alias("rd"))
        .first()
    )
    assert nrow["rd"] is None
