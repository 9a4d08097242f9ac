"""Deterministic sampling for training-data curation.

``df.sample()`` draws from a per-partition RNG: the selected set
changes with partitioning, retries, and cluster size — useless for
reproducible corpus curation or incremental pipelines (yesterday's 10%
sample must still be a subset of today's 20%). These operators key the
decision on a HASH of a stable column instead:

- same row → same decision on any cluster, any partitioning, any day;
- monotone rates: the ``rate=0.1`` sample is a strict subset of the
  ``rate=0.2`` sample (threshold on the same hash value);
- per-stratum rates for balanced corpora (e.g. per language).

Hash: the first 8 hex digits of ``md5(key)`` as a 32-bit uniform —
md5 is identical in every engine, so the sample is recomputable in
plain SQL (DuckDB oracle) with no snapshot. Optional ``salt`` derives
independent samples from the same keys (train/held-out splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


#: NULL keys hash to this sentinel string instead of propagating NULL —
#: without it a NULL key makes BOTH split filters evaluate to NULL and
#: the row silently vanishes from train AND holdout, breaking the
#: exhaustiveness contract. A real key would have to stringify to a
#: NUL-prefixed literal to collide.
_NULL_KEY = "\x00null"


def sample_hash(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) per key: first 8 md5 hex digits / 2^32.
    NULL keys are coalesced to a sentinel so every row gets a decision
    (all NULL-key rows share one draw — they move as a block)."""
    k = F.coalesce(key.cast("string"), F.lit(_NULL_KEY))
    if salt:
        k = F.concat(k, F.lit(salt))
    return F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("double") / F.lit(
        _DENOM
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff hash(key) < rate — reproducible everywhere,
    monotone in ``rate``. Pure codegen'd exprs, filter runs map-side
    (pushes below later shuffles)."""
    return df.filter(sample_hash(F.col(key_col), salt) < rate)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. lang → rate) — the corpus
    re-balancing primitive. Strata absent from ``rates`` get
    ``default_rate``. Rate lookup is an inline CASE over the (small,
    driver-known) rates map — no join, no shuffle."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(sample_hash(F.col(key_col), salt) < rate)


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_rate: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic train/holdout split on one
    hash draw (no row is lost or duplicated under retries)."""
    h = sample_hash(F.col(key_col), salt)
    return df.filter(h >= holdout_rate), df.filter(h < holdout_rate)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_cols: list[Column],
    salt_key: str | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """Keep at most ``k`` rows per group under a deterministic total
    order — the RefinedWeb-style per-registrable-domain document cap
    (one SEO farm must not become 4% of the corpus). ``order_cols``
    define which rows SURVIVE (e.g. longest first); the caller must
    make the order total — end it with a unique key, or ties make
    ``row_number`` partitioning-dependent and the kept set
    irreproducible.

    Scale shape: one exchange on the group key and a per-group sort.
    The hot-group hazard (a single domain with 10^8 pages sorts inside
    ONE task) has a salted two-phase path: with ``salt_buckets = S``
    and a ``salt_key`` row-identity column, phase 1 takes the top-k
    within each of the group's S hash buckets (hot group's sort splits
    S ways), phase 2 takes the global top-k of the ≤ S·k survivors.
    Provably identical to the single-phase result: every global top-k
    row ranks ≤ k inside its own bucket (restriction of a total order
    can only improve rank), so phase 1 never drops a final survivor.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    out_cols = df.columns
    if salt_buckets > 1:
        if not salt_key:
            raise ValueError("salted two-phase capping needs salt_key")
        bucket = F.pmod(F.xxhash64(F.col(salt_key)), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col(group_col), bucket).orderBy(*order_cols)
        df = (
            df.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= k)
            .drop("_rn1")
        )
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(*out_cols)
    )


def _copies_expr(key: Column, rate: float, salt: str) -> Column:
    """Copy count for one row under fractional repetition ``rate``:
    ``floor(rate)`` guaranteed copies plus one extra iff the row's md5
    draw clears the fractional part. The floor/frac split happens
    driver-side in python, so both engines compare the SAME double
    literal against the SAME dyadic draw — no float boundary can
    disagree. ``rate < 1`` degenerates to :func:`deterministic_sample`
    (0 or 1 copies), so upsampling strictly generalizes thinning."""
    if rate < 0:
        raise ValueError("rate must be >= 0")
    n_full = int(rate)  # floor for non-negative floats
    frac = float(rate) - n_full
    extra = F.when(
        sample_hash(key, salt) < F.lit(frac), F.lit(1)
    ).otherwise(F.lit(0))
    return (F.lit(n_full) + extra).cast("int")


def upsample_with_repetition(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "rep",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic fractional UPsampling — the missing half of the
    mixing recipe. :func:`mixture_sample` can only thin (rate ≤ 1);
    real pretraining mixes REPEAT high-value sources (Wikipedia ×3,
    books ×2.5 — the Pile/LLaMA epoch tables). Each row is emitted
    ``floor(rate)`` times plus one extra copy iff its md5 draw clears
    ``frac(rate)``, each copy stamped with a 0-based ``epoch`` index,
    so expected multiplicity is exactly ``rate`` and the realized
    corpus is reproducible on any cluster, any partitioning, any day.

    Scale shape: one map-side ``explode(sequence(...))`` projection —
    the corpus never shuffles and output size is rate·n by
    construction. Properties (all tested):

    - epoch sets are PREFIXES: the rate=r corpus is a sub-multiset of
      the rate=r+1 corpus (copy k exists iff k < n_copies);
    - rate < 1 reproduces ``deterministic_sample`` with epoch 0;
    - NULL keys share the sentinel draw-block like every sampler here.

    The guard ``when(n > 0, sequence(0, n-1))`` matters: Spark's
    ``sequence(0, -1)`` DESCENDS (yielding [0, -1]) instead of being
    empty — the same trap the LM gate hit — so zero-copy rows must
    drop via NULL, never via an empty-looking sequence."""
    n = _copies_expr(F.col(key_col), rate, salt)
    # generators can't be wrapped in expressions — build the sequence
    # in the target element type instead of casting explode's output
    seq = F.when(
        n > 0, F.sequence(F.lit(0).cast("long"), (n - F.lit(1)).cast("long"))
    )
    return df.withColumn(epoch_col, F.explode(seq))


def stratified_upsample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "rep",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Per-stratum repetition rates (source → epochs) — the Pile-style
    mixing table as one deterministic plan. The floor/frac split is
    computed per stratum driver-side and compiled into two inline CASE
    expressions (rates are a small driver-known map — no join, no
    shuffle); strata absent from ``rates`` repeat at ``default_rate``.
    NULL strata take ``default_rate`` via the CASE fallthrough."""
    for v in list(rates.values()) + [default_rate]:
        if v < 0:
            raise ValueError("rates must be >= 0")
    n_full = F.lit(int(default_rate))
    frac = F.lit(float(default_rate) - int(default_rate))
    for value, r in sorted(rates.items()):
        n_full = F.when(
            F.col(stratum_col) == value, F.lit(int(r))
        ).otherwise(n_full)
        frac = F.when(
            F.col(stratum_col) == value, F.lit(float(r) - int(r))
        ).otherwise(frac)
    extra = F.when(
        sample_hash(F.col(key_col), salt) < frac, F.lit(1)
    ).otherwise(F.lit(0))
    n = (n_full + extra).cast("int")
    seq = F.when(
        n > 0, F.sequence(F.lit(0).cast("long"), (n - F.lit(1)).cast("long"))
    )
    return df.withColumn(epoch_col, F.explode(seq))


def mixture_rates(
    df: DataFrame, stratum_col: str, alpha: float
) -> DataFrame:
    """Temperature-mixing acceptance rates — the Pile/LLaMA domain-
    mixing recipe (target share ∝ p_s^α) realized by pure thinning:
    with r_raw(s) = (n_s / N)^(α−1), rate(s) = r_raw(s) / max_s
    r_raw(s), the kept corpus's stratum shares are proportional to
    p_s^α and the binding stratum keeps everything (thinning can only
    downsample — this is the unique maximal realization). α = 1 keeps
    all rows; α < 1 flattens toward uniform (rare sources bind);
    α > 1 sharpens (big sources bind). NULL strata group under the
    shared sentinel draw-block like NULL sample keys.

    ``(stratum, n, rate)`` — two tiny aggregations (stratum
    cardinality rows); every float derives from exact integer counts
    by a fixed expression tree, so the oracle recomputes rates
    bit-identically."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    g = F.coalesce(F.col(stratum_col).cast("string"), F.lit(_NULL_KEY))
    cnt = df.select(g.alias("_g")).groupBy("_g").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.agg(F.sum("n").alias("_N"))
    raw = cnt.crossJoin(F.broadcast(tot)).withColumn(
        "_raw",
        F.pow(
            F.col("n").cast("double") / F.col("_N"),
            F.lit(float(alpha) - 1.0),
        ),
    )
    mx = raw.agg(F.max("_raw").alias("_rmax"))
    return raw.crossJoin(F.broadcast(mx)).select(
        F.col("_g").alias("stratum"),
        "n",
        (F.col("_raw") / F.col("_rmax")).alias("rate"),
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic temperature resampling: broadcast the per-stratum
    rates and keep each row iff its md5 draw clears its stratum's
    rate. One broadcast join + a map-side filter over the corpus —
    no corpus shuffle, partitioning-invariant, monotone in α toward
    the binding stratum."""
    # private aliases so the join never collides with user columns
    # named stratum/n/rate
    rates = mixture_rates(df, stratum_col, alpha).select(
        F.col("stratum").alias("_mx_g"), F.col("rate").alias("_mx_rate")
    )
    g = F.coalesce(F.col(stratum_col).cast("string"), F.lit(_NULL_KEY))
    return (
        df.withColumn("_g", g)
        .join(F.broadcast(rates), F.col("_g") == F.col("_mx_g"))
        .filter(sample_hash(F.col(key_col), salt) < F.col("_mx_rate"))
        .drop("_g", "_mx_g", "_mx_rate")
    )
