"""Mergeable cardinality sketches — HyperLogLog (Flajolet, Fusy,
Gandouet & Meunier 2007) over the engine's md5 idiom: the crawl
analytics companion to the Bloom/cuckoo seen-filters. A register
table (≤ 2^p rows) answers "how many DISTINCT urls has this host
contributed?" across waves/days/crawls by max-merge — no seen-set
scan, no exact distinct shuffle of the key space; registers from
independent crawls union with a groupBy-max, which is exactly how
per-day sketches roll up to per-month on a cluster.

Reference seam: the single-node crawler's progress counters are
exact in-memory sets (SURVEY §2.5 A1/A2); at 10^10 urls the exact
per-host distinct is a full key shuffle — the sketch is the
published answer (Spark's own approx_count_distinct is an HLL++;
this is the ENGINE-OWNED register table: persistable, mergeable,
oracle-recomputable, unlike the opaque built-in).

Determinism (cross-engine exact, not just close): bucket = first 4
md5 bytes mod 2^p; rho = leading-zero rank of a SECOND md5 word
(bytes 5-8) via ``33 - length(bin(w))`` — both engines' ``bin()``
emit minimal binary, no float log anywhere. The harmonic sum
``Σ 2^-rho`` is a sum of dyadic rationals whose exponent span
(p + 33 bits) fits float64's 53-bit mantissa for p ≤ 18, so it is
EXACTLY order-independent — the one float reduction in the engine
that needs no quantization protocol. The estimate formula (alpha
bias constant, raw harmonic estimate, linear-counting small-range
correction) is an identical expression tree over those exact
values in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_P = 18  # p + 33-bit rho span must fit float64's 53-bit mantissa


def hll_alpha(p: int) -> float:
    """The published bias constant (HLL paper §4)."""
    m = 1 << p
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> int:
    if not 4 <= p <= MAX_P:
        raise ValueError(f"p must be in [4, {MAX_P}], got {p}")
    return p


def hll_bucket_rho(key: Column, p: int, salt: str = "") -> tuple[Column, Column]:
    """(bucket, rho) from two independent md5 words: bucket = first
    4 digest bytes mod 2^p; rho = 33 − length(bin(w)) over the next
    4 bytes (w = 0 ⇒ all 32 bits zero ⇒ rho = 33)."""
    k = key.cast("string")
    if salt:
        k = F.concat(k, F.lit(salt))
    h = F.md5(k)
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(1 << p)
    )
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(w))
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = 12,
    group_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """``(*group_cols, bucket, rho)`` — the sketch state: max rho per
    (group, bucket). One partial-aggregated exchange capped at
    groups·2^p rows; absent buckets mean register 0 (handled by the
    estimator, never materialized)."""
    _check_p(p)
    b, r = hll_bucket_rho(F.col(key_col), p, salt)
    g = list(group_cols or [])
    return (
        df.select(*g, b.alias("bucket"), r.alias("rho"))
        .groupBy(*g, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union sketches (e.g. per-day → per-month): groupBy-max over
    the stacked register rows. Exact: max is associative,
    commutative, idempotent — re-merging is harmless."""
    it = iter(register_tables)
    u = next(it)
    for t in it:
        u = u.unionByName(t)
    keys = [c for c in u.columns if c != "rho"]
    return u.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    p: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``(*group_cols, n_obs, zeros, est)`` — the HLL estimate per
    group. ``est`` is floored to BIGINT (the identical float tree in
    both engines makes the floor safe): raw = α·m²/Σ2^-rho with
    absent registers contributing 2⁰ = 1, and the small-range
    linear-counting correction m·ln(m/zeros) when raw ≤ 2.5·m and
    any register is empty."""
    _check_p(p)
    m = 1 << p
    alpha = hll_alpha(p)
    g = list(group_cols or [])
    agg = registers.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_hs_obs"),
    )
    zeros = (F.lit(m) - F.col("n_obs")).alias("zeros")
    hsum = F.col("_hs_obs") + (F.lit(m) - F.col("n_obs")).cast("double")
    raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) / hsum
    lin = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (F.lit(m) - F.col("n_obs")).cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_obs") < F.lit(m)), lin
    ).otherwise(raw)
    return agg.select(
        *g,
        "n_obs",
        zeros,
        F.floor(est).cast("long").alias("est"),
    )


def hll_count_distinct(
    df: DataFrame,
    key_col: str,
    p: int = 12,
    group_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """registers → estimate in one call (the common path)."""
    return hll_estimate(
        hll_registers(df, key_col, p, group_cols, salt), p, group_cols
    )


# ---------------------------------------------------- count-min sketch
#
# Cormode & Muthukrishnan 2005 — the frequency twin of the HLL
# cardinality sketch: "how often has THIS url/host/shape been seen"
# from a (depth × width) counter table instead of an exact
# per-key count (a full key-space shuffle at 10^10 urls). Estimates
# NEVER undercount; overcount is bounded by ε·N with probability
# 1−δ at width=⌈e/ε⌉, depth=⌈ln 1/δ⌉. Merging sketches of disjoint
# streams is counter-wise addition. Everything is exact integer
# arithmetic — the oracle recomputes buckets, counters and the min
# reduction from scratch with no float protocol at all.


def cms_bucket(key: Column, row: int, width: int, salt: str = "cms") -> Column:
    """Row-salted md5 bucket — depth independent hash functions from
    one digest family."""
    k = F.concat(key.cast("string"), F.lit(f"{salt}{row}"))
    return F.pmod(
        F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("long"),
        F.lit(width),
    )


def cms_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    salt: str = "cms",
) -> DataFrame:
    """``(row, bucket, c)`` — the sketch state. One exploded
    projection (depth rows per input row, map-side) and one partial-
    aggregated exchange capped at depth·width rows. ``weight_col``
    counts weighted occurrences (e.g. bytes per url) instead of 1."""
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(
                            F.col(key_col), r, width, salt
                        ).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_rb"),
        w.alias("_w"),
    )
    return (
        rows.select("_rb.row", "_rb.bucket", "_w")
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("c"))
    )


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Counter-wise addition — sketches of disjoint streams combine
    exactly (CM is a linear sketch)."""
    it = iter(tables)
    u = next(it)
    for t in it:
        u = u.unionByName(t)
    return u.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def cms_lookup(
    table: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """``(key, est)`` — min over the depth row counters (absent
    counter = 0). The sketch side broadcasts (≤ depth·width rows);
    the keys side never shuffles."""
    probes = keys.select(
        F.col(key_col),
        *[
            cms_bucket(F.col(key_col), r, width, salt).alias(f"_b{r}")
            for r in range(depth)
        ],
    )
    out = probes
    for r in range(depth):
        side = table.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"_b{r}"),
            F.col("c").alias(f"_c{r}"),
        )
        out = out.join(F.broadcast(side), f"_b{r}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(depth)]
    )
    return out.select(F.col(key_col), est.alias("est"))
