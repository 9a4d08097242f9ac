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
- ``strip_boilerplate``: ZERO-shuffle — the chrome set folds to one
  broadcastable ``(host, [digests])`` dim (chrome-per-host is small
  by construction) and each page filters its own line array map-side;
  the corpus text never leaves its partition and document order is
  free.

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
    # the big exchange is the per-(page, line) dedup over ALL line
    # occurrences: ship a 16-byte url digest instead of the url string
    # (same count — the md5-digest identity discipline used for the
    # lines themselves), roughly halving the dominant shuffle's bytes
    per_line = (
        lines.select(
            "host",
            F.unhex(F.md5(F.col("url"))).alias("_u"),
            F.md5("line").alias("line_digest"),
        )
        .distinct()
        .groupBy("host", "line_digest")
        .agg(F.count("*").alias("n_pages"))
    )
    # per-host page counts, salted two-phase: a naive
    # count_distinct(url) partial-dedups (host, url) map-side and then
    # funnels EVERY distinct url of a host through one reducer — the
    # giant-host skew. Salting on hash(url) keeps each url in exactly
    # one salt group, so the per-group distinct counts sum exactly;
    # the host-keyed exchange then carries ≤64 rows per host.
    per_host = (
        pages.groupBy(
            F.col(host_col).alias("host"),
            F.pmod(F.hash(F.col(url_col)), F.lit(64)).alias("_salt"),
        )
        .agg(F.count_distinct(F.col(url_col)).alias("_c"))
        .groupBy("host")
        .agg(F.sum("_c").alias("host_pages"))
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
    empty lines always kept.

    ZERO-shuffle strip: the chrome set aggregates to one small
    ``(host, [digests])`` dim (bounded by total chrome lines — small
    by construction: a line must appear on ≥min_frac_pct of a host's
    pages to qualify, so per-host chrome is O(template size), not
    O(corpus)); that dim broadcasts and each page filters its own
    line array in place — no posexplode shuffle, no reassembly
    aggregation, the corpus text never leaves its partition. Original
    order is free (array order IS document order)."""
    ch_dim = chrome.groupBy(F.col("host").alias("_ch_host")).agg(
        F.collect_list("line_digest").alias("_chrome")
    )
    t = F.col(text_col)
    joined = pages.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.when(t.isNull(), F.lit(None)).otherwise(
            F.split(t, "\n")
        ).alias("_lines"),
    ).join(
        F.broadcast(ch_dim),
        F.col("host") == F.col("_ch_host"),
        "left",
    )
    # empty lines are structure, never stripped; a NULL-text page (a
    # fetch miss) stays NULL with NULL line counts — rewriting it to
    # '' would erase the miss marker and fake a pure-chrome page
    kept = F.when(F.col("_lines").isNull(), F.lit(None)).otherwise(
        F.when(F.col("_chrome").isNull(), F.col("_lines")).otherwise(
            F.filter(
                F.col("_lines"),
                lambda x: (x == "")
                | ~F.array_contains(F.col("_chrome"), F.md5(x)),
            )
        )
    )
    return joined.select(
        "url",
        "host",
        F.when(F.col("_lines").isNull(), F.lit(None).cast("string"))
        .otherwise(F.array_join(kept, "\n"))
        .alias("text"),
        F.size("_lines").cast("long").alias("n_lines_in"),
        F.size(kept).cast("long").alias("n_lines_kept"),
    )
