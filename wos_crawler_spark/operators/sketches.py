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
