"""Host-level boilerplate line removal — the navigation/menu/footer
stripper: a line that appears on a large fraction of a host's pages
is site chrome, not content (the line-frequency recipe used by
OSCAR/Ungoliant and CCNet-era pipelines; trafilatura does the same
judgment from markup, which ``htmltext`` already approximates —
this operator makes the statistical judgment from TEXT alone, so it
also catches chrome that survives extraction).

Distinct from :func:`textdedup.paragraph_dedup`: that is
corpus-GLOBAL keep-first dedup (the C4 rule — one survivor keeps the
text); boilerplate removal is host-SCOPED and keeps NO copy — chrome
is noise on every page, including the first.

Scale shape:

- ``host_line_stats``: one explode + two partially-aggregated
  exchanges — (host, line_digest) page-counts and per-host page
  counts; both bounded by distinct (host, line) / host cardinality,
  and only 16-byte digests ride the shuffle, never line text.
- ``boilerplate_lines``: a map-side integer-threshold filter over
  the stats (``n_pages·100 >= min_frac_pct·host_pages`` — the
  cross-engine integer protocol) plus the ``min_pages`` floor that
  keeps tiny hosts from declaring everything chrome.
- ``strip_boilerplate``: pages explode to (url, pos, line), left-anti
  join on (host, digest) against the boilerplate set (broadcastable:
  chrome-per-host is small by construction), reassemble in original
  order via one url-keyed aggregation — the :func:`paragraph_dedup`
  reassembly shape.

Semantics (pinned by tests + the driver oracle):

- line identity is the EXACT line string (md5 digest; no trimming —
  indentation variants are different chrome), split on ``\\n``;
- a line repeated within ONE page counts once toward its page count
  (distinct urls per (host, line));
- empty lines are structure, not chrome: never counted, never
  stripped;
- every page of the host keeps its non-chrome lines in original
  order; a page of pure chrome survives with ``text = ''``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_line_stats(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """``(host, line_digest, n_pages, host_pages)`` — how many of the
    host's pages carry each (non-empty) line."""
    lines = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.col("line") != "")
    per_line = (
        lines.select("host", "url", F.md5("line").alias("line_digest"))
        .distinct()
        .groupBy("host", "line_digest")
        .agg(F.count("*").alias("n_pages"))
    )
    per_host = pages.groupBy(F.col(host_col).alias("host")).agg(
        F.count_distinct(F.col(url_col)).alias("host_pages")
    )
    return per_line.join(per_host, "host")


def boilerplate_lines(
    pages: DataFrame,
    min_pages: int = 2,
    min_frac_pct: int = 50,
    host_col: str = "host",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """``(host, line_digest)`` chrome set: lines on at least
    ``min_pages`` pages AND at least ``min_frac_pct`` percent of the
    host's pages (integer cross-multiplication)."""
    if min_pages < 2:
        raise ValueError("min_pages must be >= 2 (a line on one page is content)")
    if not 0 < min_frac_pct <= 100:
        raise ValueError("min_frac_pct must be in (0, 100]")
    s = host_line_stats(pages, host_col, url_col, text_col)
    return s.filter(
        (F.col("n_pages") >= min_pages)
        & (F.col("n_pages") * 100 >= min_frac_pct * F.col("host_pages"))
    ).select("host", "line_digest")


def strip_boilerplate(
    pages: DataFrame,
    chrome: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Pages with chrome lines removed: ``(url, host, text,
    n_lines_in, n_lines_kept)`` — original line order preserved,
    empty lines always kept."""
    exploded = pages.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    ch = chrome.select(
        F.col("host").alias("_ch_host"),
        F.col("line_digest").alias("_ch_digest"),
    )
    kept = exploded.join(
        F.broadcast(ch),
        (F.col("host") == F.col("_ch_host"))
        & (F.md5(F.col("line")) == F.col("_ch_digest"))
        & (F.col("line") != ""),
        "left_anti",
    )
    rebuilt = kept.groupBy("url", "host").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s.line,
            ),
            "\n",
        ).alias("text"),
        F.count("*").alias("n_lines_kept"),
    )
    # totals carries host too (one scan, no third join), and a
    # NULL-text page (a fetch miss) stays NULL with NULL line counts
    # — rewriting it to '' would erase the miss marker and fake a
    # pure-chrome page
    t = F.col(text_col)
    totals = pages.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("_h"),
        F.when(t.isNull(), F.lit(None).cast("int"))
        .otherwise(F.size(F.split(t, "\n")))
        .alias("n_lines_in"),
    )
    # pure-chrome pages drop out of `kept` entirely — restore with ''
    return totals.join(rebuilt, "url", "left").select(
        "url",
        F.col("_h").alias("host"),
        F.when(F.col("n_lines_in").isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
        F.col("n_lines_in").cast("long").alias("n_lines_in"),
        F.when(F.col("n_lines_in").isNull(), F.lit(None).cast("long"))
        .otherwise(F.coalesce(F.col("n_lines_kept"), F.lit(0)))
        .cast("long")
        .alias("n_lines_kept"),
    )
