"""Exact corpus statistics — the monitoring surface a curation
pipeline reads after every stage (did the quality gate shift the
length distribution? is one source's token histogram collapsing?).

``percentile_approx`` is the usual Spark answer, but its result is
sketch-dependent — useless as a regression-pinned number and
unverifiable by an independent engine. The exact alternative people
reach for (per-group sort + row_number) serializes each stratum
through ONE task — the cap_per_group hazard with no cap to save it.

This module computes EXACT quantiles the scale-correct way: by
counting values, not ranking rows. The window that matters runs over
the per-stratum DISTINCT VALUES (for length-like integers, thousands
of rows) instead of the corpus (billions):

1. ``groupBy(stratum, value).count()`` — one partially-aggregated
   exchange, output capped at Σ|distinct values|;
2. cumulative counts by a window over values WITHIN each stratum;
3. the p-quantile (p = p_num/p_den rational) is the smallest value
   whose cumulative count reaches rank ``⌈p·n⌉`` — all-integer ceil
   division, no float boundary, so a DuckDB oracle recomputes every
   number from scratch.

This is the classic "type 1" (inverse-ECDF) quantile definition —
exactly SQL's ``percentile_disc``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_quantiles(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    ps: list[tuple[int, int]],
) -> DataFrame:
    """``(stratum, n, p_num, p_den, q)`` — one row per stratum ×
    requested quantile. NULL values are excluded (a NULL has no rank);
    ``n`` counts the non-NULL rows the quantile is over. Quantiles are
    rational ``p_num/p_den`` with 0 < p ≤ 1 so the target rank
    ``(p_num·n + p_den − 1) DIV p_den`` stays exact at any n."""
    for num, den in ps:
        if not (0 < num <= den):
            raise ValueError(f"need 0 < p_num <= p_den, got {num}/{den}")
    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(stratum_col).alias("stratum"),
            F.col(value_col).alias("_v"),
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy("stratum").orderBy("_v")
    wn = Window.partitionBy("stratum")
    cum = vc.withColumn(
        "_cum",
        F.sum("_c").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("_n", F.sum("_c").over(wn))
    p_arr = F.array(
        *[
            F.struct(
                F.lit(num).cast("long").alias("p_num"),
                F.lit(den).cast("long").alias("p_den"),
            )
            for num, den in ps
        ]
    )
    e = cum.withColumn("_p", F.explode(p_arr)).select(
        "stratum",
        "_v",
        "_cum",
        "_n",
        F.col("_p.p_num").alias("p_num"),
        F.col("_p.p_den").alias("p_den"),
    )
    target = F.expr("(p_num * _n + p_den - 1) DIV p_den")
    return (
        e.filter(F.col("_cum") >= target)
        .groupBy("stratum", "p_num", "p_den")
        .agg(F.max("_n").alias("n"), F.min("_v").alias("q"))
        .select("stratum", "n", "p_num", "p_den", "q")
    )
