"""Crawl-trap guard — per-host URL-*pattern* explosion cap for the
frontier (SURVEY.md §2.2 family: the admission-time guard that F8's
depth/TTL cannot express). Infinite calendars, session-id permalinks
and faceted-search grids generate unbounded DISTINCT urls that all
share one *shape*; a depth guard never fires on them and the
politeness budget only slows the bleed. The classic crawler defense
(Heritrix's path-pattern quotas, Nutch's per-host generate caps) is a
cap on urls per (host, shape), which is exactly one well-partitioned
window over the frontier in Spark.

Shape rule (pinned, Java∩RE2 — the DuckDB oracle re-runs it
byte-identically; same dialect discipline as htmllinks/htmltext):

1. shape key = lowercased host + path + query with
   - every decimal digit run in the path → ``D``,
   - every hex run of 8+ chars (session ids, content hashes) → ``H``
     (applied BEFORE the digit rule so pure-digit runs of 8+ that
     also parse as hex become ``H``, documented),
   - every query VALUE → ``V`` (keys kept — ``?page=V`` and
     ``?item=V`` are different shapes),
   - the fragment is assumed already stripped by F2 canonicalization.
2. a shape is a TRAP on its host when it covers more than
   ``cap`` distinct urls.
3. the guard keeps the ``keep`` lexicographically-smallest urls of a
   trap shape (deterministic — partitioning-invariant) and drops the
   rest; non-trap shapes pass untouched. ``keep=0`` drops the whole
   shape; default ``keep=cap`` (a trap still contributes a bounded
   sample, never an unbounded stream).

Scale design (10^10-URL frontier): ONE shuffle on (host, shape_key) —
a strictly finer key than the politeness host key, so hot-host skew
is split across that host's shapes rather than concentrated; the
count and the row_number share the same window exchange (Catalyst
reuses one sort). No driver-side state, no collect; the shape stats
surface (``trap_shapes``) is an ordinary aggregate any monitoring
sink can consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wos_crawler_spark.functions.urlnorm import url_host

#: hex run of 8+ (session ids / hashes) — applied before the digit
#: rule; lowercase only because shapes are computed on the LOWERCASED
#: url spelling below.
_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"
#: query values: '=' up to the next '&' (fragment already stripped).
_QUERY_VALUE = "=[^&]*"


def url_shape_expr(url: Column | str) -> Column:
    """Shape key for one canonical URL — host + digit/hex/value
    -collapsed path+query, all in the shared regex dialect."""
    u = F.lower(F.col(url) if isinstance(url, str) else url)
    tail = F.regexp_replace(u, "^[^:/?#]+://[^/?#]*", "")
    tail = F.regexp_replace(tail, _HEX_RUN, "H")
    tail = F.regexp_replace(tail, _DIGIT_RUN, "D")
    tail = F.regexp_replace(tail, _QUERY_VALUE, "=V")
    host = url_host(F.col(url) if isinstance(url, str) else url)
    return F.concat(host, tail)


def url_shape_sql(expr: str) -> str:
    """The same shape rule as DuckDB SQL over a url expression — the
    oracle twin (generated here so the two spellings share one
    source)."""
    u = f"lower({expr})"
    tail = f"regexp_replace({u}, '^[^:/?#]+://[^/?#]*', '', 'g')"
    tail = f"regexp_replace({tail}, '{_HEX_RUN}', 'H', 'g')"
    tail = f"regexp_replace({tail}, '{_DIGIT_RUN}', 'D', 'g')"
    tail = f"regexp_replace({tail}, '{_QUERY_VALUE}', '=V', 'g')"
    host = (
        f"regexp_replace(lower(regexp_extract({expr},"
        " '^[^:/?#]+://([^/?#]*)', 1)), ':[0-9]+$', '')"
    )
    return f"{host} || {tail}"


def url_shape_python(url_canon: str) -> str:
    """Pure-python twin of ``url_shape_expr`` (same patterns — the
    simulator's crawl twin uses it for fetch-order parity). ASCII
    urls only, like every other simulator twin."""
    import re

    u = url_canon.lower()
    tail = re.sub("^[^:/?#]+://[^/?#]*", "", u)
    tail = re.sub(_HEX_RUN, "H", tail)
    tail = re.sub(_DIGIT_RUN, "D", tail)
    tail = re.sub(_QUERY_VALUE, "=V", tail)
    m = re.match("^[^:/?#]+://([^/?#]*)", u)
    host = re.sub(":[0-9]+$", "", m.group(1) if m else "")
    return host + tail


def trap_shapes(
    frontier: DataFrame, cap: int, url_col: str = "url_canon"
) -> DataFrame:
    """``(host, shape, n_urls, is_trap)`` — the monitoring/audit
    surface: every (host, shape) with its distinct-url count. One
    aggregate exchange on the composite key."""
    return (
        frontier.select(
            url_host(F.col(url_col)).alias("host"),
            url_shape_expr(F.col(url_col)).alias("shape"),
            F.col(url_col).alias("u"),
        )
        .groupBy("host", "shape")
        .agg(F.count_distinct("u").alias("n_urls"))
        .withColumn("is_trap", F.col("n_urls") > F.lit(cap))
    )


def trap_guard(
    frontier: DataFrame,
    cap: int,
    keep: int | None = None,
    url_col: str = "url_canon",
) -> DataFrame:
    """Frontier with trap shapes capped: a shape covering more than
    ``cap`` urls on its host keeps only its ``keep`` (default:
    ``cap``) lexicographically-smallest urls. Duplicate url rows
    (pre-F1 frontiers) count once toward the cap and are kept/dropped
    as a unit via dense_rank. Input columns pass through untouched.

    NULL contract: rows whose ``url_col`` is NULL (shape key NULL)
    always pass through the safe branch — a NULL url can never
    belong to a trap shape, and it never counts toward any cap.

    EAGER semantics: the trap-shape set is computed (Spark jobs run)
    at CALL time and frozen into the returned plan as a literal
    filter. Callers that build the plan once and re-execute it
    against changed input get the original call's trap set — rebuild
    the plan per wave (run_wave does)."""
    if keep is None:
        keep = cap
    if keep > cap:
        raise ValueError(f"keep ({keep}) must be <= cap ({cap})")
    shape = url_shape_expr(F.col(url_col))
    tagged = frontier.withColumn("_tg_shape", shape)
    # Find trap shapes FIRST, by counting — NOT by ranking the whole
    # frontier: the original plan exchanged and SORTED every candidate
    # row on (shape, url) each wave (+59% wave cost in the gate
    # ledger) to rank rows that, in the common case, belong to no
    # trap at all. The count uses the salted two-phase distinct idiom
    # (a trap shape's urls would otherwise funnel through one reducer
    # — the very explosion being guarded) and only (shape, salt,
    # count) partials ride its exchanges. The trap-shape set is
    # driver-scale BY DEFINITION (a shape must exceed ``cap`` urls to
    # qualify), so it collects eagerly — one narrow extra job — and
    # the common zero-trap wave returns the frontier plan UNCHANGED:
    # no join, no sort, no extra branch. With traps, only their rows
    # pay the rank window (where Spark now pushes WindowGroupLimit:
    # top-``keep`` per shape survives the sort).
    trap_rows = (
        tagged.groupBy(
            "_tg_shape",
            F.pmod(F.hash(F.col(url_col)), F.lit(64)).alias("_tg_salt"),
        )
        .agg(F.count_distinct(F.col(url_col)).alias("_c"))
        .groupBy("_tg_shape")
        .agg(F.sum("_c").alias("_tg_n"))
        .filter(F.col("_tg_n") > F.lit(cap))
        .select("_tg_shape")
        .collect()
    )
    traps = [r["_tg_shape"] for r in trap_rows]
    if not traps:
        return frontier
    if len(traps) <= 1024:
        is_trap = F.col("_tg_shape").isin(traps)  # map-side literal set
    else:
        raise ValueError(
            f"{len(traps)} shapes exceed cap={cap} — a frontier where "
            "thousands of shapes are simultaneously exploding is "
            "upstream breakage (seed flood / canonicalization bug), "
            "not a trap-cap situation; refuse rather than build a "
            "giant literal filter"
        )
    # NULL shapes (NULL url): isin() is NULL for them, so both
    # branches would drop the row — route them through safe explicitly
    safe = tagged.filter(~is_trap | F.col("_tg_shape").isNull())
    w = Window.partitionBy("_tg_shape").orderBy(F.col(url_col))
    kept_trap = (
        tagged.filter(is_trap)
        .withColumn("_tg_rank", F.dense_rank().over(w))
        .filter(F.col("_tg_rank") <= F.lit(keep))
        .drop("_tg_rank")
    )
    return safe.unionByName(kept_trap).select(*frontier.columns)
