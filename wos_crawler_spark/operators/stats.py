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


def corpus_datacard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The corpus "data card" — one ``(metric, value)`` BIGINT table a
    curation pipeline publishes alongside every release (the Datasheets
    /Data-Card reporting practice): size, byte mass, language mix,
    exact-duplicate mass, and exact length quantiles, all in one pass
    family.

    ALL values are integers — counts, byte totals, and
    :func:`value_quantiles`' exact percentile_disc lengths — so the
    table is bit-identical cross-engine with no float protocol.
    Shuffle shape: three partially-aggregated exchanges (global agg,
    lang agg, digest agg) + the quantile's distinct-value-bounded
    exchange; text never rides a shuffle (digests only).

    Metrics: ``n_docs``, ``n_null_text``, ``total_bytes``,
    ``n_langs``, ``lang:<code>`` per language, ``n_exact_dup``
    (rows minus distinct normalized digests — the mass exact dedup
    would remove), ``len_p50`` / ``len_p90`` (bytes,
    percentile_disc over non-null texts)."""
    from wos_crawler_spark.operators.textdedup import norm_text

    t = F.col(text_col)
    base = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(t.isNull().cast("long")).alias("n_null_text"),
        F.sum(F.coalesce(F.octet_length(t), F.lit(0))).alias(
            "total_bytes"
        ),
        F.count_distinct(F.col(lang_col)).alias("n_langs"),
        (
            F.count(t) - F.count_distinct(F.md5(norm_text(t)))
        ).alias("n_exact_dup"),
    )
    long_rows = base.selectExpr(
        "stack(5, 'n_docs', n_docs, 'n_null_text', n_null_text,"
        " 'total_bytes', total_bytes, 'n_langs', n_langs,"
        " 'n_exact_dup', n_exact_dup) AS (metric, value)"
    )
    langs = df.filter(F.col(lang_col).isNotNull()).groupBy(
        F.concat(F.lit("lang:"), F.col(lang_col)).alias("metric")
    ).agg(F.count(F.lit(1)).alias("value"))
    qs = value_quantiles(
        df.select(
            F.lit("all").alias("_s"), F.octet_length(t).alias("_len")
        ),
        "_s",
        "_len",
        [(1, 2), (9, 10)],
    ).select(
        F.concat(
            F.lit("len_p"),
            (F.col("p_num") * 100 / F.col("p_den")).cast("int").cast("string"),
        ).alias("metric"),
        F.col("q").cast("long").alias("value"),
    )
    return (
        long_rows.select("metric", F.col("value").cast("long").alias("value"))
        .unionByName(langs.select("metric", F.col("value").cast("long")))
        .unionByName(qs)
    )
