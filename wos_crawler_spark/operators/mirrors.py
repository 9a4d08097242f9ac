"""Mirror-host detection — domain-level dedup for a web crawl: two
hosts serving (nearly) the same content set (mirrors, CDNs fronting
one origin, scraped clones, www/non-www splits that survived URL
canonicalization because the PATHS differ). Doc-level dedup removes
the duplicate documents one by one; the crawl-side win is noticing
the HOST relationship and not fetching the mirror at all.

Signal: content-set containment. Each host is its set of distinct
page digests; a pair qualifies iff
``|A ∩ B| / min(|A|, |B|)`` ≥ t — containment, not Jaccard, because a
small full mirror of a large site IS a mirror (Jaccard would dilute
it by the big site's size). The threshold is rational and the test an
integer cross-multiplication — no float protocol needed; digests are
``md5(text)`` so a DuckDB oracle recomputes everything from scratch.

Scale shape: one distinct pass to (host, digest), one digest-keyed
self-join for shared counts. The fan-out hazard is BOILERPLATE — an
empty page / 404 template / cookie banner shared by 10⁵ hosts would
contribute a 10¹⁰-pair bucket; digests appearing on more than
``max_hosts_per_digest`` hosts are dropped BEFORE pairing (the
SimHash ``bucket_cap`` move: recall-losing in the direction that can
only drop boilerplate evidence, never wrong — a digest on 10⁵ hosts
is a template, not a mirror signal). Containment denominators use the
UNCUT set sizes, so the cut can only lower a pair's score, never
inflate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_host_pairs(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    t_num: int = 1,
    t_den: int = 2,
    max_hosts_per_digest: int = 64,
) -> DataFrame:
    """``(host_a, host_b, n_shared, n_a, n_b)`` — host pairs (a < b)
    with content containment ``n_shared·t_den ≥ min(n_a, n_b)·t_num``.
    NULL text digests like empty text (one more boilerplate bucket,
    subject to the same cut)."""
    if not (0 < t_num <= t_den):
        raise ValueError("need 0 < t_num <= t_den")
    if max_hosts_per_digest < 1:
        raise ValueError("max_hosts_per_digest must be >= 1")
    d = pages.select(
        F.col(host_col).alias("_h"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_dg"),
    ).distinct()
    # uncut per-host content-set sizes (denominators)
    sizes = d.groupBy("_h").agg(F.count(F.lit(1)).alias("_n"))
    spread = d.groupBy("_dg").agg(F.count(F.lit(1)).alias("_hn"))
    kept = d.join(
        spread.filter(F.col("_hn") <= max_hosts_per_digest).select("_dg"),
        "_dg",
    )
    pairs = (
        kept.select(F.col("_h").alias("host_a"), "_dg")
        .join(kept.select(F.col("_h").alias("host_b"), "_dg"), "_dg")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # the sizes dim has one row per HOST — orders of magnitude below
    # the pages/pairs tables by construction — so both denominator
    # joins broadcast rather than dragging pairs through two SMJs
    return (
        pairs.join(
            F.broadcast(
                sizes.select(
                    F.col("_h").alias("host_a"), F.col("_n").alias("n_a")
                )
            ),
            "host_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("_h").alias("host_b"), F.col("_n").alias("n_b")
                )
            ),
            "host_b",
        )
        .filter(
            F.col("n_shared") * t_den
            >= F.least(F.col("n_a"), F.col("n_b")) * t_num
        )
        .select(
            "host_a", "host_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
    )
