"""URL-level quality gate — the cheapest filter in the entire
pipeline, because it runs BEFORE the fetch (RefinedWeb §3.1 runs URL
filtering first for exactly this reason: every URL dropped here saves
a network round trip, a politeness slot, and a parse). Three layers,
all pure codegen'd expressions over the URL string — zero shuffles,
zero Python, and every pattern in the Java∩RE2 common dialect so a
DuckDB oracle recomputes verdicts byte-identically:

1. **structural features** — path depth, URL length, query-parameter
   count, file extension, digit ratio of the path (session-id /
   calendar smell, complementing the trap guard's per-host view with
   a stateless per-URL one);
2. **extension blocklist** — assets a text pipeline never wants
   (images, css, js, archives, media); matched on the LAST dot
   segment of the path, case-insensitive via explicit lower();
3. **banned-substring score** — a small driver-known word list
   counted as substrings of the lowercased URL (the RefinedWeb
   URL-scoring move); the gate takes a max count, not a binary hit,
   so 'class' containing 'ass'-style collateral can be tolerated by
   threshold instead of whitelist surgery.

Thresholds are integers (or integer cross-multiplications for the
digit ratio) — no float boundary anywhere. NULL urls fail the gate
(keep = false, never NULL) so downstream filters see a total verdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wos_crawler_spark.functions.urlnorm import _PATH_RE

#: default asset extensions a text crawl refuses (RefinedWeb-style)
DEFAULT_BLOCKED_EXTENSIONS = (
    "css", "js", "png", "jpg", "jpeg", "gif", "svg", "ico", "webp",
    "mp3", "mp4", "avi", "mov", "zip", "gz", "tar", "rar", "exe",
    "woff", "woff2", "ttf", "pdf",
)


def url_features(url: Column) -> Column:
    """Struct of structural URL features. ``path`` is the RFC-3986
    path component (shared extraction regex with urlnorm);
    ``ext`` is the lowercased last dot-segment of the path's final
    slash-segment ('' when the leaf has no dot). All counting is
    length arithmetic — codegen-friendly, no per-char UDF."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    leaf = F.element_at(F.split(path, "/", -1), -1)
    ext = F.when(
        leaf.contains("."),
        F.lower(F.element_at(F.split(leaf, "\\.", -1), -1)),
    ).otherwise(F.lit(""))
    # depth = number of non-empty path segments
    depth = F.size(F.filter(F.split(path, "/", -1), lambda s: s != ""))
    digits = F.length(F.regexp_replace(path, "[^0-9]", ""))
    return F.struct(
        F.length(url).alias("url_len"),
        depth.cast("int").alias("path_depth"),
        F.length(path).alias("path_len"),
        digits.alias("path_digits"),
        F.when(
            url.contains("?"),
            F.size(F.split(F.regexp_extract(url, r"\?([^#]*)", 1), "&", -1)),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_query_params"),
        ext.alias("ext"),
    )


def banned_substring_count(
    url: Column, banned: list[str]
) -> Column:
    """How many of the (small, driver-known) banned words occur as
    substrings of the lowercased URL — an inline sum of ``contains``
    flags, no join, no regex alternation (a banned word needs no
    escaping this way)."""
    u = F.lower(url)
    if not banned:
        return F.lit(0)
    return sum(
        (F.when(u.contains(w.lower()), 1).otherwise(0) for w in banned),
        F.lit(0),
    ).cast("int")


def url_keep_expr(
    url: Column,
    max_url_len: int = 2048,
    max_path_depth: int = 12,
    max_query_params: int = 8,
    max_digit_num: int = 1,
    max_digit_den: int = 2,
    blocked_extensions: tuple[str, ...] = DEFAULT_BLOCKED_EXTENSIONS,
    banned_words: list[str] | None = None,
    max_banned: int = 0,
) -> Column:
    """The conjoint keep verdict as ONE boolean column — what the
    crawl loop's admission gate filters on (the full
    :func:`url_quality_gate` keeps the per-rule booleans for
    monitoring). NULL urls → false, never NULL."""
    f = url_features(url)
    keep = (
        url.isNotNull()
        & (f["url_len"] <= max_url_len)
        & (f["path_depth"] <= max_path_depth)
        & (f["n_query_params"] <= max_query_params)
        & (f["path_digits"] * max_digit_den <= f["path_len"] * max_digit_num)
        & ~f["ext"].isin(*[e.lower() for e in blocked_extensions])
        & (banned_substring_count(url, banned_words or []) <= max_banned)
    )
    return F.coalesce(keep, F.lit(False))


def url_gate_python(
    url: str | None,
    max_url_len: int = 2048,
    max_path_depth: int = 12,
    max_query_params: int = 8,
    max_digit_num: int = 1,
    max_digit_den: int = 2,
    blocked_extensions: tuple[str, ...] = DEFAULT_BLOCKED_EXTENSIONS,
    banned_words: tuple[str, ...] = (),
    max_banned: int = 0,
) -> bool:
    """Pure-python twin of :func:`url_keep_expr` for the crawl
    simulator — independent re-statement of the same rules (re module,
    not Catalyst), kept in lockstep by the full-crawl parity test."""
    import re as _re

    if url is None:
        return False
    m = _re.match(r"^[^:/?#]+://[^/?#]*([^?#]*)", url)
    path = m.group(1) if m else ""
    depth = len([s for s in path.split("/") if s])
    digits = len(_re.sub(r"[^0-9]", "", path))
    leaf = path.split("/")[-1]
    ext = leaf.rsplit(".", 1)[-1].lower() if "." in leaf else ""
    if "?" in url:
        q = _re.search(r"\?([^#]*)", url)
        nq = len(q.group(1).split("&")) if q else 0
    else:
        nq = 0
    lu = url.lower()
    n_banned = sum(1 for w in banned_words if w.lower() in lu)
    return (
        len(url) <= max_url_len
        and depth <= max_path_depth
        and nq <= max_query_params
        and digits * max_digit_den <= len(path) * max_digit_num
        and ext not in {e.lower() for e in blocked_extensions}
        and n_banned <= max_banned
    )


def url_quality_gate(
    frontier: DataFrame,
    url_col: str = "url",
    max_url_len: int = 2048,
    max_path_depth: int = 12,
    max_query_params: int = 8,
    max_digit_num: int = 1,
    max_digit_den: int = 2,
    blocked_extensions: tuple[str, ...] = DEFAULT_BLOCKED_EXTENSIONS,
    banned_words: list[str] | None = None,
    max_banned: int = 0,
) -> DataFrame:
    """Annotate the frontier with per-rule booleans and the conjoint
    ``url_keep`` verdict (the Gopher-rules shape: per-rule columns so
    monitoring can see WHICH gate fires). Digit rule: path digits /
    path length ≤ max_digit_num/max_digit_den by integer
    cross-multiplication (empty paths pass — 0 ≤ 0). NULL urls fail
    every rule explicitly."""
    u = F.col(url_col)
    f = url_features(u)
    ok_len = f["url_len"] <= max_url_len
    ok_depth = f["path_depth"] <= max_path_depth
    ok_query = f["n_query_params"] <= max_query_params
    ok_digits = (
        f["path_digits"] * max_digit_den <= f["path_len"] * max_digit_num
    )
    ok_ext = ~f["ext"].isin(*[e.lower() for e in blocked_extensions])
    n_banned = banned_substring_count(u, banned_words or [])
    # the conjoint verdict is the SHARED expression the crawl loop
    # filters on — one definition, no way for monitor and gate to
    # diverge
    keep = url_keep_expr(
        u, max_url_len, max_path_depth, max_query_params,
        max_digit_num, max_digit_den, blocked_extensions,
        banned_words, max_banned,
    )
    return frontier.select(
        "*",
        F.coalesce(ok_len, F.lit(False)).alias("url_ok_len"),
        F.coalesce(ok_depth, F.lit(False)).alias("url_ok_depth"),
        F.coalesce(ok_query, F.lit(False)).alias("url_ok_query"),
        F.coalesce(ok_digits, F.lit(False)).alias("url_ok_digits"),
        F.coalesce(ok_ext, F.lit(False)).alias("url_ok_ext"),
        F.coalesce(n_banned, F.lit(0)).alias("url_n_banned"),
        F.coalesce(keep, F.lit(False)).alias("url_keep"),
    )
