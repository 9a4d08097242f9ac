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

from pyspark.sql import Column, DataFrame
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
