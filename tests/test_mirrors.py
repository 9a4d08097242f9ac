"""Mirror-host detection (operators/mirrors.py): containment vs a
python twin, the small-full-mirror case Jaccard would miss, the
boilerplate cut (recall-losing never score-inflating), duplicate-url
insensitivity, partitioning invariance, guards."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.mirrors import mirror_host_pairs


def _pages(spark):
    rows = []
    # big site A: 40 distinct pages
    for i in range(40):
        rows.append(("a.com", f"content A {i}"))
    # m.com mirrors 10 of A's pages and nothing else → containment
    # 10/min(40,10) = 1 (Jaccard would be 10/40 = 0.25 and miss it)
    for i in range(10):
        rows.append(("m.com", f"content A {i}"))
    # b.com: 20 pages, 8 shared with A → containment 8/20 = 0.4 < 1/2
    for i in range(8):
        rows.append(("b.com", f"content A {i}"))
    for i in range(12):
        rows.append(("b.com", f"content B {i}"))
    # boilerplate: one identical banner page on EVERY host incl. two
    # otherwise-unrelated hosts x/y — without the cut, x.com/y.com
    # (1 page each) would pair at containment 1
    for h in ("a.com", "m.com", "b.com", "x.com", "y.com"):
        rows.append((h, "cookie banner"))
    # duplicate rows must not inflate counts
    rows.append(("m.com", "content A 0"))
    return spark.createDataFrame(rows, "host string, text string")


def test_mirror_pairs_containment_and_boilerplate_cut(spark):
    df = _pages(spark)
    out = {
        (r["host_a"], r["host_b"]): (r["n_shared"], r["n_a"], r["n_b"])
        for r in mirror_host_pairs(
            df, t_num=1, t_den=2, max_hosts_per_digest=4
        ).collect()
    }
    # the full mirror is found; sizes include the banner (uncut
    # denominators: 40+banner=41, 10+banner=11 — the duplicate
    # "content A 0" row dedups) but shared counts exclude the banner
    # (5 hosts > cap 4). b.com∩m.com genuinely share 8 of m.com's 11
    # pages (content A 0..7) → containment 8/11 ≥ 1/2 qualifies too.
    assert out == {
        ("a.com", "m.com"): (10, 41, 11),
        ("b.com", "m.com"): (8, 21, 11),
    }
    # without the cut, boilerplate-only pairs appear at containment 1
    raw = {
        (r["host_a"], r["host_b"])
        for r in mirror_host_pairs(
            df, t_num=1, t_den=2, max_hosts_per_digest=1000
        ).collect()
    }
    assert ("x.com", "y.com") in raw


def test_mirror_pairs_threshold_and_invariance(spark):
    df = _pages(spark)
    # at t = 1/3, b.com's 8/20 = 0.4 containment with a.com qualifies
    out = {
        (r["host_a"], r["host_b"])
        for r in mirror_host_pairs(
            df, t_num=1, t_den=3, max_hosts_per_digest=4
        ).collect()
    }
    assert ("a.com", "b.com") in out and ("a.com", "m.com") in out
    a = sorted(map(tuple, mirror_host_pairs(df.repartition(1)).collect()))
    b = sorted(map(tuple, mirror_host_pairs(df.repartition(11)).collect()))
    assert a == b
    with pytest.raises(ValueError):
        mirror_host_pairs(df, t_num=0)
    with pytest.raises(ValueError):
        mirror_host_pairs(df, max_hosts_per_digest=0)
